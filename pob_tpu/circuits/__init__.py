"""Circuit definitions: batched witness builders for ProofOfBurn and Spend,
composing the gadget library. Each forward returns the public outputs plus a
`valid` flag — the conjunction of every in-circuit assertion, so invalid
inputs are rejected exactly like the reference's witness generator
(tests/test.py:65-68 negative-test convention)."""

from .spend import SpendConfig, spend_forward  # noqa: F401
from .proof_of_burn import PoBConfig, pob_forward  # noqa: F401
