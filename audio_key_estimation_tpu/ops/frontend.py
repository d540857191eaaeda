"""Single switch for the CQT front-end implementation.

Product code (dataset preprocessing, serving, bench) selects the front-end
through `Config.use_pallas_cqt` via this dispatcher rather than importing a
specific implementation, so the XLA and Pallas paths stay interchangeable
behind one interface (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cqt import CQTParams, cqt


def compute_cqt(y: jax.Array, p: CQTParams, *,
                use_pallas: bool = False,
                conv_dtype: str | jnp.dtype = "bfloat16") -> jax.Array:
    """Batched log1p-CQT: (B, L) -> (B, n_bins, T).

    use_pallas=True runs the fused Pallas kernel (interpret mode off-TPU so
    tests exercise the same code path on the CPU mesh). conv_dtype is the
    XLA path's response-conv operand storage (`Config.cqt_conv_dtype`).
    """
    if use_pallas:
        from .cqt_pallas import cqt_pallas
        interpret = jax.devices()[0].platform != "tpu"
        # conv_dtype doubles as the kernel's stream storage dtype (same
        # role: response-path operand bytes)
        return cqt_pallas(y, p, stream_dtype=jnp.dtype(conv_dtype),
                          interpret=interpret)
    return cqt(y, p, conv_dtype=jnp.dtype(conv_dtype))
