"""The jitted training superstep.

The reference alternates optimizers across *batches* in frequency-weighted
round-robin blocks (PL `frequency` dicts, core/lightning_module.py:84-87:
disc_freq batches of D updates, then gen_freq batches of G updates — e.g.
WGAN 5:1, HoloGAN 1:2). TPU-first, that whole cycle is folded into ONE jitted
superstep that consumes a stacked pytree of (disc_freq+gen_freq)·accum
micro-batches and runs the alternation on device — a single dispatch per
cycle, no host round-trips (noise sampling included, replacing the per-step
host RNG at lightning_module.py:107).

Gradient accumulation (PL accumulate_grad_batches, run_network.py:62-64)
averages grads over ``accum`` consecutive micro-batches before each optimizer
update.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState


def microbatch_count(disc_freq: int, gen_freq: int, accum: int = 1) -> int:
    return (disc_freq + gen_freq) * accum


def build_superstep(task, g_tx: optax.GradientTransformation,
                    d_tx: optax.GradientTransformation,
                    disc_freq: int, gen_freq: int, accum: int = 1,
                    ema_decay: float = 0.0, unroll: bool = False
                    ) -> Callable[[TrainState, Any, jax.Array],
                                  Tuple[TrainState, Dict[str, jax.Array]]]:
    """Returns superstep(state, batches, rng) -> (state, metrics).

    ``batches`` is a pytree whose leaves have a leading axis of
    (disc_freq+gen_freq)·accum micro-batches.

    The repeated updates inside each optimizer phase (disc_freq D updates,
    then gen_freq G updates) are rolled into a ``lax.scan`` over identical
    update bodies, so XLA compiles ONE D update and ONE G update regardless
    of the frequency ratio — WGAN's 5:1 cycle previously compiled five
    copies of the D graph (and folded WGAN at fold=8 hit multi-minute
    compiles). ``unroll=True`` keeps the straight-line Python-loop form;
    tests/test_train_step.py pins scan-vs-unrolled equality.
    """
    n_micro = microbatch_count(disc_freq, gen_freq, accum)
    if not unroll:
        return _build_scanned_superstep(task, g_tx, d_tx, disc_freq,
                                        gen_freq, accum, ema_decay)

    def superstep(state: TrainState, batches, rng: jax.Array):
        metric_sums: Dict[str, jax.Array] = {}
        metric_counts: Dict[str, int] = {}

        def record(metrics: Dict[str, jax.Array]):
            for k, v in metrics.items():
                if k in metric_sums:
                    metric_sums[k] = metric_sums[k] + v
                    metric_counts[k] += 1
                else:
                    metric_sums[k] = v
                    metric_counts[k] = 1

        s = state
        for k in range(disc_freq + gen_freq):
            is_disc = k < disc_freq
            grads_sum = None
            for a in range(accum):
                i = k * accum + a
                micro = jax.tree.map(lambda x: x[i], batches)
                rng_i = jax.random.fold_in(rng, i)
                rng_z, rng_loss = jax.random.split(rng_i)

                # WGAN clamps D weights at the top of every training_step,
                # regardless of which optimizer runs (lightning_module.py:160).
                if task.clips_disc:
                    s = s.replace(d_params=task.clip_disc(s.d_params))

                bsz = micro["image"].shape[0]
                z = task.sample_z(rng_z, bsz)

                if is_disc:
                    (loss, aux), grads = jax.value_and_grad(
                        task.disc_loss, has_aux=True)(
                        s.d_params, s.g_params, s.g_state, s.d_state,
                        micro, z, rng_loss, s.extra)
                else:
                    (loss, aux), grads = jax.value_and_grad(
                        task.gen_loss, has_aux=True)(
                        s.g_params, s.d_params, s.g_state, s.d_state,
                        micro, z, rng_loss, s.extra)

                s = s.replace(g_state=aux["g_state"], d_state=aux["d_state"],
                              step=s.step + 1,
                              extra=task.update_extra_after_microstep(s.extra))
                record(aux["metrics"])
                grads_sum = grads if grads_sum is None else jax.tree.map(
                    jnp.add, grads_sum, grads)

            grads = (grads_sum if accum == 1
                     else jax.tree.map(lambda g: g / accum, grads_sum))
            if is_disc:
                updates, new_opt = d_tx.update(grads, s.d_opt, s.d_params)
                s = s.replace(d_params=optax.apply_updates(s.d_params, updates),
                              d_opt=new_opt, d_steps=s.d_steps + 1)
            else:
                updates, new_opt = g_tx.update(grads, s.g_opt, s.g_params)
                s = s.replace(g_params=optax.apply_updates(s.g_params, updates),
                              g_opt=new_opt, g_steps=s.g_steps + 1)
                if ema_decay > 0.0 and s.g_ema is not None:
                    s = s.replace(g_ema=jax.tree.map(
                        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                        s.g_ema, s.g_params))

        metrics = {k: (metric_sums[k] / metric_counts[k]).astype(jnp.float32)
                   for k in metric_sums}
        return s, metrics

    superstep.n_micro = n_micro  # type: ignore[attr-defined]
    return superstep


def _build_scanned_superstep(task, g_tx, d_tx, disc_freq: int, gen_freq: int,
                             accum: int, ema_decay: float):
    """Scan-over-updates form of the superstep (see build_superstep)."""
    n_micro = microbatch_count(disc_freq, gen_freq, accum)

    def superstep(state: TrainState, batches, rng: jax.Array):
        def microstep(s, micro, i, is_disc):
            rng_i = jax.random.fold_in(rng, i)
            rng_z, rng_loss = jax.random.split(rng_i)
            # WGAN clamps D weights at the top of every training_step,
            # regardless of which optimizer runs (lightning_module.py:160).
            if task.clips_disc:
                s = s.replace(d_params=task.clip_disc(s.d_params))
            bsz = micro["image"].shape[0]
            z = task.sample_z(rng_z, bsz)
            if is_disc:
                (_, aux), grads = jax.value_and_grad(
                    task.disc_loss, has_aux=True)(
                    s.d_params, s.g_params, s.g_state, s.d_state,
                    micro, z, rng_loss, s.extra)
            else:
                (_, aux), grads = jax.value_and_grad(
                    task.gen_loss, has_aux=True)(
                    s.g_params, s.d_params, s.g_state, s.d_state,
                    micro, z, rng_loss, s.extra)
            s = s.replace(g_state=aux["g_state"], d_state=aux["d_state"],
                          step=s.step + 1,
                          extra=task.update_extra_after_microstep(s.extra))
            return s, grads, aux["metrics"]

        def make_update(is_disc):
            def update(s, xs):
                micro_stack, idx_stack = xs  # leading axis: accum
                grads_sum = None
                msums: Dict[str, jax.Array] = {}
                for a in range(accum):
                    micro = jax.tree.map(lambda x: x[a], micro_stack)
                    s, grads, metrics = microstep(
                        s, micro, idx_stack[a], is_disc)
                    for k, v in metrics.items():
                        msums[k] = msums[k] + v if k in msums else v
                    grads_sum = grads if grads_sum is None else jax.tree.map(
                        jnp.add, grads_sum, grads)
                grads = (grads_sum if accum == 1
                         else jax.tree.map(lambda g: g / accum, grads_sum))
                if is_disc:
                    updates, new_opt = d_tx.update(grads, s.d_opt, s.d_params)
                    s = s.replace(
                        d_params=optax.apply_updates(s.d_params, updates),
                        d_opt=new_opt, d_steps=s.d_steps + 1)
                else:
                    updates, new_opt = g_tx.update(grads, s.g_opt, s.g_params)
                    s = s.replace(
                        g_params=optax.apply_updates(s.g_params, updates),
                        g_opt=new_opt, g_steps=s.g_steps + 1)
                    if ema_decay > 0.0 and s.g_ema is not None:
                        s = s.replace(g_ema=jax.tree.map(
                            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                            s.g_ema, s.g_params))
                return s, {k: v / accum for k, v in msums.items()}
            return update

        s = state
        phase_metrics = []
        for is_disc, freq, lo in ((True, disc_freq, 0),
                                  (False, gen_freq, disc_freq * accum)):
            if freq == 0:
                continue
            micro_idx = lo + jnp.arange(freq * accum, dtype=jnp.int32)
            stack = jax.tree.map(
                lambda x: x[lo:lo + freq * accum].reshape(
                    (freq, accum) + x.shape[1:]), batches)
            idx = micro_idx.reshape(freq, accum)
            if freq == 1:
                s, metrics = make_update(is_disc)(
                    s, jax.tree.map(lambda x: x[0], (stack, idx)))
                metrics = {k: v[None] for k, v in metrics.items()}
            else:
                s, metrics = jax.lax.scan(
                    make_update(is_disc), s, (stack, idx))
            phase_metrics.append((metrics, freq * accum))

        # merge phases: keys present in both (e.g. HoloGAN's q_loss) average
        # over every microstep that emitted them, matching the unrolled form
        sums: Dict[str, jax.Array] = {}
        counts: Dict[str, int] = {}
        for metrics, n in phase_metrics:
            for k, stacked in metrics.items():
                contrib = jnp.sum(stacked) * (n // stacked.shape[0])
                sums[k] = sums.get(k, 0.0) + contrib
                counts[k] = counts.get(k, 0) + n
        out = {k: (sums[k] / counts[k]).astype(jnp.float32) for k in sums}
        return s, out

    superstep.n_micro = n_micro  # type: ignore[attr-defined]
    return superstep


def build_folded_superstep(superstep, fold: int):
    """lax.scan ``fold`` supersteps into ONE dispatch (train.fold_steps).

    Dispatch amortisation: the epoch loop normally issues one XLA dispatch
    per superstep; on hosts where dispatch latency is material (remote-relay
    TPU, busy host CPU) folding K pre-staged supersteps into a scanned
    megastep removes K-1 host round-trips with bit-identical math. Batches
    are stacked [fold, n_micro, batch, ...]; ``rng`` is ``(root_key,
    base_counter)`` and the per-superstep keys are derived ON DEVICE as
    ``fold_in(root_key, base + i·n_micro)`` — exactly the keys the unfolded
    epoch loop computes, without the K tiny host→device key transfers per
    dispatch that would re-pay the latency being amortised. Metrics return
    averaged over the fold, matching the epoch-mean the unfolded loop
    computes.
    """
    n_micro_sub = superstep.n_micro

    def folded(state, stacked_batches, rng):
        root_key, base = rng

        def body(s, xs):
            b, i = xs
            key = jax.random.fold_in(root_key, base + i * n_micro_sub)
            s, m = superstep(s, b, key)
            return s, m

        state, ms = jax.lax.scan(
            body, state,
            (stacked_batches, jnp.arange(fold, dtype=jnp.int32)))
        return state, jax.tree.map(lambda m: m.mean(0), ms)

    folded.n_micro = superstep.n_micro * fold  # type: ignore[attr-defined]
    folded.fold = fold  # type: ignore[attr-defined]
    return folded
