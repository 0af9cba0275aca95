"""Multi-chip sharding: proof-batch data parallelism, MSM point-sharding with
collective reduction, and the four-step distributed NTT (SURVEY.md §2.10,
§5.7-5.8). All built on jax.sharding.Mesh + shard_map so the same code runs on
a real slice (collectives over ICI) or a host-simulated mesh in tests."""
