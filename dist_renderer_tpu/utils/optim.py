"""Shared inverse-rendering optimizer harness (SURVEY.md §2 row
'Inverse-rendering optimizer loops', §7 step 7).

Reference analog: per-task Adam loops in ``core/utils/`` train utils + task
scripts. Here there is ONE harness: an optax optimizer stepped by a jitted
update function over an arbitrary 'variables' pytree (latent code, pose
vector, or both), with LR scheduling, optional orbax checkpoint/resume, and
structured per-step metrics (SURVEY.md §5 'Metrics / logging')."""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dist_renderer_tpu.config import OptimConfig


class FitResult(NamedTuple):
    variables: Any                 # optimized pytree
    loss_history: jax.Array        # [steps]
    metrics: Dict[str, Any]        # aux metrics from the last step


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(cfg.lr_decay_steps, 1),
        decay_rate=cfg.lr_decay_rate,
        staircase=True,
    )
    return optax.adam(learning_rate=schedule)


def fit(
    loss_fn: Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]],
    variables: Any,
    cfg: OptimConfig = OptimConfig(),
    checkpoint_dir: Optional[str] = None,
    log_every: int = 0,
    callback: Optional[Callable[[int, Any, float], None]] = None,
    carry_init: Any = None,
) -> FitResult:
    """Minimize ``loss_fn(variables) -> (loss, aux)`` with Adam.

    The whole step (value_and_grad + optax update) is one jitted function;
    the march inside loss_fn contributes no backward tape (SURVEY.md §3.2).
    With ``checkpoint_dir`` set, saves (variables, opt_state, step) every
    ``cfg.checkpoint_every`` steps and resumes from the latest checkpoint.

    carry_init: optional non-differentiated loop state. When given,
    ``loss_fn(variables, carry) -> (loss, aux)`` and aux must contain
    ``"carry"``: the next carry, threaded through the loop (e.g. the
    warm-start render state — renderer.warm_from_trace)."""
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables)
    start_step = 0

    if checkpoint_dir:
        from dist_renderer_tpu.models.checkpoint import restore_state

        (variables, opt_state), start_step = restore_state(
            checkpoint_dir, (variables, opt_state)
        )

    def value_grad(v, carry):
        if carry_init is None:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(v)
        else:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(v, carry)
            aux = dict(aux)
            carry = aux.pop("carry")
        return loss, aux, grads, carry

    @jax.jit
    def step_fn(variables, opt_state, carry):
        loss, aux, grads, carry = value_grad(variables, carry)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss, aux, carry

    # Fast path: no per-step host work requested => run the WHOLE loop in
    # one lax.scan on device. Over the tunneled TPU a Python step loop
    # pays ~0.3 s dispatch latency per iteration; scan pays it once.
    if callback is None and not log_every and not (
        checkpoint_dir and cfg.checkpoint_every
    ):
        @jax.jit
        def scan_all(variables, opt_state, loop_carry):
            def body(c, _):
                v, o, lc = c
                loss, aux, grads, lc = value_grad(v, lc)
                updates, o = tx.update(grads, o, v)
                v = optax.apply_updates(v, updates)
                return (v, o, lc), (loss, aux)

            (v, o, _), (losses, auxs) = jax.lax.scan(
                body, (variables, opt_state, loop_carry), None,
                length=cfg.steps - start_step,
            )
            return v, o, losses, auxs

        variables, opt_state, losses_arr, auxs = scan_all(
            variables, opt_state, carry_init
        )
        aux = {k: v[-1] for k, v in auxs.items()}
        return FitResult(
            variables=variables, loss_history=losses_arr,
            metrics=aux,
        )

    losses = []
    loop_carry = carry_init
    aux: Dict[str, jax.Array] = {}
    for step in range(start_step, cfg.steps):
        variables, opt_state, loss, aux, loop_carry = step_fn(
            variables, opt_state, loop_carry
        )
        losses.append(loss)
        if log_every and (step % log_every == 0 or step == cfg.steps - 1):
            print(f"[fit] step {step:5d}  loss {float(loss):.6f}")
        if callback is not None:
            callback(step, variables, float(loss))
        if (
            checkpoint_dir
            and cfg.checkpoint_every
            and (step + 1) % cfg.checkpoint_every == 0
        ):
            from dist_renderer_tpu.models.checkpoint import save_state

            save_state(checkpoint_dir, (variables, opt_state), step + 1)

    history = jnp.stack(losses) if losses else jnp.zeros((0,))
    return FitResult(variables=variables, loss_history=history,
                     metrics={k: v for k, v in aux.items()})
