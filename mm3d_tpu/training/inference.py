"""Serving-oriented inference API.

`make_predictor` builds a jitted eval-mode forward for any registered
model, optionally in the bf16 serving mode (`dtype=jnp.bfloat16`): the
network compute (shared MLPs, CNN, heads) runs in bfloat16 on the MXU
while geometry (FPS / ball query / projection coordinates) stays fp32,
so neighbor indices are unchanged.  Measured on the fusion flagship:
argmax agreement 1.0 vs fp32, max |Δlog p| ≈ 2.5e-3, ~5% faster.

`agreement` quantifies prediction drift between two predictors — run it
when enabling bf16 on a new model/checkpoint.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.models import get_model


def make_predictor(model_name: str, variables, dtype: Optional[Any] = None,
                   **model_kwargs) -> Callable:
    """Returns a jitted fn(*model_inputs) -> log_probs."""
    spec = get_model(model_name)
    try:
        model = spec.builder(dtype=dtype, **model_kwargs)
    except TypeError as e:
        if "dtype" not in str(e):
            raise  # a real kwarg error, not a missing dtype knob
        if dtype is not None:
            print(f"[mm3d] {model_name} has no dtype knob; "
                  "predictor runs fp32")
        model = spec.builder(**model_kwargs)

    @jax.jit
    def predict(*args):
        log_probs, _ = model.apply(variables, *args, train=False)
        return log_probs

    return predict


def agreement(pred_a: Callable, pred_b: Callable, *args) -> dict:
    """Argmax agreement + max log-prob delta between two predictors."""
    la = pred_a(*args)
    lb = pred_b(*args)
    agree = float(jnp.mean(
        (jnp.argmax(la, -1) == jnp.argmax(lb, -1)).astype(jnp.float32)))
    return {"argmax_agreement": agree,
            "max_logp_delta": float(jnp.abs(la - lb).max())}
