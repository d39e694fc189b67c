"""Whole-training-loop-in-one-Pallas-kernel for the 1D advection solve.

DEMOTED out of the package (round 2): a validated negative result, not a
production path — see STATUS below and COMPARISON.md. Kept under
tools/experiments/ with its test (run `python -m pytest
tools/experiments/test_pallas_trainer.py` from the repo root).

Measured on the TPU (tools/perf_probe.py advect_scaling): at the bench size
(5000 points, 2x20 SIREN) ~80% of a 2000-iteration chunk is fixed
per-HLO-op dispatch overhead inside the lax.scan body — XLA cannot fuse
across the ~dozen matmuls of forward+jacfwd+backward+Adam. This kernel runs
the ENTIRE Adam loop inside one Mosaic kernel: parameters, optimizer state
and the plateau scheduler live in VMEM scratch for all iterations; per
iteration it draws collocation points from the on-core PRNG, evaluates the
implicit-midpoint advection residual, and applies Adam — the loop body is
built with jax.grad/vmap INSIDE the kernel (the kernel body is traced JAX,
so autodiff composes with Pallas; no hand-derived backprop).

Feature dims are padded to the 128-lane width; padded weight columns stay
exactly zero through training because their gradients are zero.

Semantics match models/solver.py for the advection phase: sum of
{main, bc} losses, Adam(lr), ReduceLROnPlateau on 'main' (factor 0.1,
patience, rel threshold), early-stop freeze at the LR floor.

STATUS (measured 2026-08-16, TPU v5e via tunnel): compiles and trains
correctly (equivalence-tested against plain JAX/optax), but at the bench
size it is SLOWER than the XLA lax.scan path (4.23 s vs 0.91 s per
2000-iteration step): the VMEM-forced batch tiling serializes 10 tile
gradient passes per iteration and Mosaic's codegen for the large autodiff
body does not beat XLA's fusion pipeline. Kept as a validated experimental
component; a competitive version needs a hand-scheduled backward with
explicit layouts. The production solve path remains models/solver.py.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OMEGA_0 = 30.0
_LANE = 128


def _pad_params(params):
    out = []
    for w, b in params:
        out.append((jnp.pad(w, ((0, _LANE - w.shape[0]),
                                (0, _LANE - w.shape[1]))),
                    jnp.pad(b, (0, _LANE - b.shape[0]))[None, :]))
    return out


def _row0():
    """(1, LANE) one-hot selector for row/lane 0 — Mosaic has no lowering
    for offset-changing slices like mat[0] or vec[:, 0], so rows and lanes
    are extracted with selector matmuls instead."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    return (col == 0).astype(jnp.float32)


def _u_and_dudx(params, x_col, n_layers):
    """Value and d/dx for 1D input given as a column (N, 1).

    Dual-number style forward: for the first layer dz/dx = W0 row 0;
    afterwards chain through sin with cos factors. (N, LANE) tensors
    throughout, MXU matmuls; returns (N, 1) value and derivative columns.
    """
    sel = _row0()                                        # (1, LANE)
    w0, b0 = params[0]
    w0row = jnp.dot(sel, w0, preferred_element_type=jnp.float32)  # (1, LANE)
    z = jnp.dot(x_col, w0row, preferred_element_type=jnp.float32) + b0
    dz = jnp.broadcast_to(w0row, z.shape)                # (N, LANE)
    for i in range(1, n_layers):
        h = jnp.sin(OMEGA_0 * z)
        dh = OMEGA_0 * jnp.cos(OMEGA_0 * z) * dz
        w, b = params[i]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        dz = jnp.dot(dh, w, preferred_element_type=jnp.float32)
    selT = sel.T                                         # (LANE, 1)
    return (jnp.dot(z, selT, preferred_element_type=jnp.float32),
            jnp.dot(dz, selT, preferred_element_type=jnp.float32))


def fused_advect_fit(params: Sequence[Tuple[jax.Array, jax.Array]],
                     prev: Sequence[Tuple[jax.Array, jax.Array]],
                     seed: jax.Array,
                     *, n_iters: int, n_samples: int, n_boundary: int,
                     half_length: float, dt: float, vel: float,
                     lr: float, plateau_factor: float = 0.1,
                     plateau_patience: int = 500,
                     plateau_threshold: float = 1e-4,
                     plateau_min_lr: float = 1e-8,
                     early_stop_min_lr: float = 1.1e-8,
                     early_stop: bool = True,
                     adam_b1: float = 0.9, adam_b2: float = 0.999,
                     adam_eps: float = 1e-8, interpret: bool = False,
                     host_uniforms: jax.Array | None = None):
    """Run the full advection solve; returns (new_params, main_loss_history).

    params/prev: [(W (in,out), b (out,)), ...] unpadded SIREN weights.
    host_uniforms: optional (n_iters, n_samples + n_boundary, 2) U[0,1)
    table replacing the on-core PRNG — required in interpret mode (the TPU
    prng primitives have no CPU lowering) and useful for determinism tests.
    """
    n_layers = len(params)
    shapes = [(w.shape, b.shape) for w, b in params]
    p_pad = _pad_params(params)
    q_pad = _pad_params(prev)

    # flatten padded params into one (n_layers*2, LANE, LANE) carrier:
    # slot 2i = W_i, slot 2i+1 = b_i broadcast on row 0
    def pack(pp):
        slots = []
        for w, b in pp:
            slots.append(w)
            slots.append(jnp.concatenate(
                [b, jnp.zeros((_LANE - 1, _LANE), b.dtype)], axis=0))
        return jnp.stack(slots)

    theta0 = pack(p_pad)
    theta_prev = pack(q_pad)

    def unpack(theta):
        # bias rows extracted with the selector matmul (no offset slices)
        sel = _row0()
        return [(theta[2 * i],
                 jnp.dot(sel, theta[2 * i + 1],
                         preferred_element_type=jnp.float32))
                for i in range(n_layers)]

    mask = _param_mask(shapes)

    use_host_rng = host_uniforms is not None

    def kernel(seed_ref, theta_ref, prev_ref, mask_ref, uni_ref,
               out_theta_ref, loss_ref, m_ref, v_ref):
        if not use_host_rng:
            pltpu.prng_seed(seed_ref[0])
        out_theta_ref[:] = theta_ref[:]
        m_ref[:] = jnp.zeros_like(m_ref)
        v_ref[:] = jnp.zeros_like(v_ref)
        prev_theta = prev_ref[:]

        def loss(theta, x_col, xb_col):
            ps = unpack(theta)
            qs = unpack(prev_theta)
            u, du = _u_and_dudx(ps, x_col, n_layers)
            u0, du0 = _u_and_dudx(qs, x_col, n_layers)
            resid = (u - u0) / dt + vel * (du + jax.lax.stop_gradient(du0)) / 2.0
            main = jnp.mean(resid ** 2)
            ub = _u_and_dudx(ps, xb_col, n_layers)[0]
            bc = jnp.mean(ub ** 2)
            return main + bc, main

        grad_fn = jax.grad(loss, has_aux=True)

        # batch tiling: N x LANE activations (+ autodiff residuals) for the
        # full batch exceed VMEM; accumulate gradients over TILE-row chunks
        TILE = 512
        n_tiles = max(1, -(-n_samples // TILE))
        eff_n = n_tiles * TILE   # fused path rounds the MC batch up

        def tile_loss(theta, x_col):
            ps = unpack(theta)
            qs = unpack(prev_theta)
            u, du = _u_and_dudx(ps, x_col, n_layers)
            u0, du0 = _u_and_dudx(qs, x_col, n_layers)
            resid = ((u - u0) / dt
                     + vel * (du + jax.lax.stop_gradient(du0)) / 2.0)
            return jnp.sum(resid ** 2) / eff_n

        def bc_loss(theta, xb_col):
            ps = unpack(theta)
            ub = _u_and_dudx(ps, xb_col, n_layers)[0]
            return jnp.mean(ub ** 2)

        tile_grad = jax.value_and_grad(tile_loss)
        bc_grad = jax.value_and_grad(bc_loss)

        def body(i, carry):
            best, bad, scale, stopped, last_main = carry
            # --- sample collocation + boundary points
            theta = out_theta_ref[:]
            if use_host_rng:
                # test path: whole batch at once from the host table
                table = uni_ref[pl.ds(i, 1)][0]      # (ns + nb, 2)
                u01 = table[:n_samples]
                b01 = table[n_samples:]
                x_col = ((u01[:, 0] * 2.0 - 1.0) * half_length)[:, None]
                side = jnp.where(b01[:, 1] < 0.5, -1.0, 1.0)
                xb_col = (side * half_length
                          + (b01[:, 0] * 2.0 - 1.0) * 1e-4)[:, None]
                g, main = grad_fn(theta, x_col, xb_col)
            else:
                sel0 = _row0().T                              # (LANE, 1)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
                sel1 = (col == 1).astype(jnp.float32).T       # (LANE, 1)

                def tile_step(_, acc):
                    g_acc, main_acc = acc
                    bits = pltpu.prng_random_bits((TILE, _LANE))
                    u01 = ((bits >> 8).astype(jnp.float32)
                           * (1.0 / (1 << 24)))
                    ux = jnp.dot(u01, sel0,
                                 preferred_element_type=jnp.float32)
                    x_col = (ux * 2.0 - 1.0) * half_length
                    mt, gt = tile_grad(theta, x_col)
                    return g_acc + gt, main_acc + mt

                g, main = jax.lax.fori_loop(
                    0, n_tiles, tile_step,
                    (jnp.zeros_like(theta), jnp.float32(0.0)))

                bbits = pltpu.prng_random_bits((n_boundary, _LANE))
                b01 = ((bbits >> 8).astype(jnp.float32)
                       * (1.0 / (1 << 24)))
                b0c = jnp.dot(b01, sel0, preferred_element_type=jnp.float32)
                b1c = jnp.dot(b01, sel1, preferred_element_type=jnp.float32)
                side = jnp.where(b1c < 0.5, -1.0, 1.0)
                xb_col = side * half_length + (b0c * 2.0 - 1.0) * 1e-4
                _, gb = bc_grad(theta, xb_col)
                g = g + gb
            g = g * mask_ref[:]

            # --- Adam (bias-corrected), scaled by the plateau LR scale
            m = adam_b1 * m_ref[:] + (1 - adam_b1) * g
            v = adam_b2 * v_ref[:] + (1 - adam_b2) * g * g
            t = (i + 1).astype(jnp.float32)
            # b**t as exp(t ln b): Mosaic has no powf lowering
            bc1 = 1.0 - jnp.exp(t * math.log(adam_b1))
            bc2 = 1.0 - jnp.exp(t * math.log(adam_b2))
            mhat = m / bc1
            vhat = v / bc2
            update = lr * scale * mhat / (jnp.sqrt(vhat) + adam_eps)

            active = jnp.logical_not(stopped)
            activef = active.astype(jnp.float32)
            out_theta_ref[:] = theta - update * activef
            m_ref[:] = jnp.where(active, m, m_ref[:])
            v_ref[:] = jnp.where(active, v, v_ref[:])
            if use_host_rng:
                # full per-iteration history (interpret/test mode only:
                # Mosaic requires aligned dynamic stores, the interpreter
                # does not)
                loss_ref[pl.ds(i, 1)] = main[None]

            # --- ReduceLROnPlateau on 'main' (torch semantics, rel mode)
            improved = main < best * (1.0 - plateau_threshold)
            new_best = jnp.where(improved, main, best)
            new_bad = jnp.where(improved, 0, bad + 1)
            trigger = new_bad > plateau_patience
            new_scale = jnp.where(
                trigger, jnp.maximum(scale * plateau_factor,
                                     plateau_min_lr / lr), scale)
            new_bad = jnp.where(trigger, 0, new_bad)
            new_stopped = stopped
            if early_stop:
                new_stopped = jnp.logical_or(
                    stopped, new_scale <= early_stop_min_lr / lr)
            return (jnp.where(active, new_best, best),
                    jnp.where(active, new_bad, bad),
                    jnp.where(active, new_scale, scale),
                    new_stopped, jnp.where(active, main, last_main))

        best, bad, scale, stopped, last_main = jax.lax.fori_loop(
            0, n_iters, body,
            (jnp.float32(jnp.inf), jnp.int32(0), jnp.float32(1.0),
             jnp.asarray(False), jnp.float32(jnp.inf)))
        if not use_host_rng:
            # compiled mode: final stats block written once; iota masks
            # instead of .at[].set (scatter has no Mosaic lowering)
            row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            on_row0 = row == 0
            stats = jnp.zeros((8, 128), jnp.float32)
            for j, val in enumerate([last_main, best, scale,
                                     stopped.astype(jnp.float32)]):
                stats = jnp.where(on_row0 & (col == j), val, stats)
            loss_ref[:] = stats

    n_slots = 2 * n_layers
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY if interpret
                                else pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY if interpret
                                else pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_slots, _LANE, _LANE),
                                        jnp.float32),
                   jax.ShapeDtypeStruct(
                       (n_iters,) if use_host_rng else (8, 128),
                       jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((n_slots, _LANE, _LANE), jnp.float32),
            pltpu.VMEM((n_slots, _LANE, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )
    uni = (host_uniforms if use_host_rng
           else jnp.zeros((1, 1, 2), jnp.float32))
    out_theta, losses = call(jnp.asarray([seed], jnp.int32), theta0,
                             theta_prev, mask, uni)
    if not use_host_rng:
        # stats block -> {last_main, best, lr_scale, stopped}
        losses = {"last_main": losses[0, 0], "best": losses[0, 1],
                  "lr_scale": losses[0, 2], "stopped": losses[0, 3] > 0.5}

    # unpack back to the original (unpadded) layout
    new_params = []
    for i, ((wi, wo), (bo,)) in enumerate(shapes):
        new_params.append((out_theta[2 * i][:wi, :wo],
                           out_theta[2 * i + 1][0][:bo]))
    return new_params, losses


def _param_mask(shapes) -> jax.Array:
    """1.0 on real parameter entries of the packed theta, 0.0 on padding —
    keeps padded lanes exactly zero through training."""
    slots: List[jax.Array] = []
    for (wi, wo), (bo,) in shapes:
        wm = jnp.zeros((_LANE, _LANE)).at[:wi, :wo].set(1.0)
        bm = jnp.zeros((_LANE, _LANE)).at[0, :bo].set(1.0)
        slots.append(wm)
        slots.append(bm)
    return jnp.stack(slots)
