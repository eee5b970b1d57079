"""misti_tpu: TPU-native rebuild of the MiSTI migration/split-time inference tool.

A JAX/XLA re-design of Genomics-HSE/MiSTI (coalescent-likelihood inference of
two-population isolation-with-migration models from PSMC demographies and the
joint site frequency spectrum).  The numerical core is expressed as constant
basis tensors + `lax.scan` interval recursions, batched with `vmap` over
optimiser candidates and sharded with `shard_map` over bootstrap replicates.
"""

__version__ = "0.1.0"
