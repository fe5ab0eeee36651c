"""Small pytree helpers shared across entry points."""

import jax
from jax import numpy as jnp


def tree_to_f32(tree):
    """Cast every floating leaf of a pytree to float32; leave the rest.

    The fp32 test/eval protocol (reference src/train.py:100-118,
    configs/eval_peptide.yaml:19-25): bf16-trained checkpoints are sampled
    and tested 32-true, so any bf16-stored leaves are cast up before the
    protocol model is applied.
    """
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
