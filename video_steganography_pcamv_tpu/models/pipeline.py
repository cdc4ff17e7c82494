"""Flagship device pipeline: the fused P-frame analyse+embed-cost+encode
step as one jittable function, plus the multi-stream batched variant.

This is the "model" of this framework in ML terms: the computation whose
throughput defines the benchmark (BASELINE.json north star: 1080p
encode+embed fps/chip). The CLI encoder calls the same building blocks
with host entropy coding in between; this fused form is what
__graft_entry__ compile-checks and what the multi-chip dry-run shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..encoder import me as ME
from ..encoder import inter as INTER
from ..stego import cost as COST


@functools.partial(jax.jit, static_argnames=(
    "qp", "qpc", "mbh", "mbw", "rng", "lam", "subpel", "decimate",
    "with_stego"))
def p_frame_step(y, u, v, ref_luma, ref_u, ref_v, prev_mv,
                 qp: int, qpc: int, mbh: int, mbw: int, rng: int,
                 lam: int, subpel: int = 2, decimate: bool = True,
                 with_stego: bool = True):
    """One P frame, all device stages fused:
    full-pel ME -> subpel refine -> transform/encode -> RCA alt-MV costs.

    Returns dict with mv field, levels/cbp, recon planes, stego rho/alt.
    """
    pred_fp = jnp.clip(prev_mv // 4, -rng, rng)
    mv_fp, _ = ME.fullpel_search.__wrapped__(
        y, ref_luma[0], pred_fp, rng, mbh, mbw, lam)
    mv_q, _ = ME.subpel_refine.__wrapped__(
        y, ref_luma, mv_fp, prev_mv, mbh, mbw, lam, subpel)
    out = INTER.encode_p_frame_device.__wrapped__(
        y, u, v, ref_luma, ref_u, ref_v, mv_q, qp, qpc, mbh, mbw,
        decimate)
    out["mv"] = mv_q
    if with_stego:
        cost_mv = jnp.asarray(COST.cost_mv_table(lam))
        rho, alt, _ = COST.alt_mv_costs.__wrapped__(
            y, ref_luma, mv_q, prev_mv, cost_mv, qp, mbh, mbw, decimate)
        out["stego_rho"] = rho
        out["stego_alt_mv"] = alt
    return out


def multi_stream_step(ys, us, vs, ref_lumas, ref_us, ref_vs, prev_mvs,
                      **kw):
    """vmapped p_frame_step over a leading stream axis [S, ...]."""
    fn = functools.partial(p_frame_step, **kw)
    return jax.vmap(fn)(ys, us, vs, ref_lumas, ref_us, ref_vs, prev_mvs)
