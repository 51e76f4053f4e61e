"""Two-network alternating training step (GAN-style).

Reference: src/tha4/shion/base/training/ TwoNetworksTrainingProtocol — the
shion framework ships an alternating two-module protocol (used for
adversarial phases in THA training historically; the shipped distillation
recipes are single-network).  Functional equivalent: one fused step that
updates network A on loss_a (B frozen), then B on loss_b (A frozen).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

from tha4_tpu.distiller.recipes import adam_init, adam_update


def make_two_network_step(
    loss_a: Callable,  # (params_a, params_b, batch) -> (scalar, aux dict)
    loss_b: Callable,  # (params_a, params_b, batch) -> (scalar, aux dict)
):
    """Returns step(params_a, opt_a, params_b, opt_b, batch, lr_a, lr_b)."""

    @jax.jit
    def step(params_a, opt_a, params_b, opt_b, batch, lr_a, lr_b):
        (la, aux_a), grads_a = jax.value_and_grad(loss_a, argnums=0, has_aux=True)(
            params_a, jax.lax.stop_gradient(params_b), batch
        )
        params_a, opt_a = adam_update(grads_a, opt_a, params_a, lr_a)

        (lb, aux_b), grads_b = jax.value_and_grad(loss_b, argnums=1, has_aux=True)(
            jax.lax.stop_gradient(params_a), params_b, batch
        )
        params_b, opt_b = adam_update(grads_b, opt_b, params_b, lr_b)

        metrics = {"loss_a": la, "loss_b": lb}
        metrics.update({f"a_{k}": v for k, v in aux_a.items()})
        metrics.update({f"b_{k}": v for k, v in aux_b.items()})
        return params_a, opt_a, params_b, opt_b, metrics

    return step


def init_two_network_state(params_a, params_b) -> Tuple:
    return adam_init(params_a), adam_init(params_b)
