"""Host-side harness: input loading/shaping, golden commitment computation,
burn-key PoW grinding, block-header assembly (the role of the reference's
tests/main.py input generator)."""
