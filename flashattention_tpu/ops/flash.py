"""Core Pallas TPU flash-attention forward kernels.

TPU-native redesign of the reference's fused CUDA kernels:

- ``flash_attention`` is the tuned flagship kernel, the MXU/VMEM analog of the
  thread-coarsened SMEM/register kernel ``flash_tiled_coarse``
  (``/root/reference/src/flashattention.cu:139-355``) and its causal twin
  ``flash_tiled_coarse_causal`` (``:359-579``).  The reference's two-level
  tiling hierarchy (SMEM block tile -> per-thread TM x TN register tile) maps to
  (HBM -> VMEM block tile via BlockSpec pipelining -> MXU 128x128 systolic tile
  via ``jnp.dot``); its B_r/B_c block sizes map to ``block_q``/``block_kv``;
  its ``CACHE_Q`` residency policy maps to the Q BlockSpec being invariant
  across the KV grid dimension (Pallas keeps the tile resident in VMEM).
- The causal path implements both reference optimizations: whole-KV-block skip
  above the diagonal (``src/flashattention.cu:434``) via ``pl.when`` on the
  grid step, and elementwise masking of the diagonal block
  (``src/flashattention.cu:480-486``) via a broadcasted-iota mask.
- Unlike the reference (which allocates an ``O_l`` output but never writes it,
  ``src/flashattention.cu:608-609``), the softmax statistics (l, m) are
  first-class outputs (``save_residuals=True``) because they are the
  cross-device ring-attention combiner state and the backward-pass residuals.

TPU-specific optimizations (tuned on v5e, see scripts/tune_flash.py):

- **MXU-computed softmax denominator**: for head_dim < 128 the PV matmul
  wastes output lanes (the MXU always produces 128-lane tiles), so V is
  extended with a ones-column — ``p @ [V | 1]`` yields PV *and* the row sum
  ``l`` in one matmul, and the online rescale ``acc = alpha * acc + p @ V_ext``
  updates both with the same recurrence.  This removes the VPU row-sum
  reduction (~15% end-to-end on the S=8192 headline shape).
- **Precision ladder** for fp32 inputs (the MXU is a bf16 engine; fp32
  matmuls are emulated by multi-pass bf16):
  ``"bf16"``      1 pass,  max-abs-err ~8e-3 on the reference headline shape
                  (passes the reference's public allclose gate, atol=1e-1,
                  ``bench_flashattention.py:74``);
  ``"bf16_3x"``   3 passes via an explicit (hi, lo) bf16 split of each fp32
                  operand (drops only the lo*lo term), err ~1.3e-5 (passes the
                  reference's strict kernel-lab gate, 1e-4,
                  ``src/llm.c/attention_forward.cu:1262``) — the default;
  ``"float32"``   XLA HIGHEST (6 passes), bit-level fp32 dot, err ~1.6e-6.
  bf16 inputs always run the MXU natively (1 pass).
- **Lane-packed fp32 emulation** (head_dim <= 64, unquantized): the v5e MXU
  pass cost is *independent of the contraction width* up to 128 lanes
  (measured: K=32/64/128 contractions all take the same time per output
  tile — scripts/probe_mxu.py), so a d<=64 contraction leaves half or more
  of the input lanes idle.  The "bf16_3x" mode therefore auto-upgrades to a
  packed schedule that places the (hi, lo) bf16 split of each fp32 operand
  in those idle lanes: QK^T runs ``[qh|ql].[kh|kl] + [qh|ql].[kl|kh]``
  (2 full-width passes, ALL FOUR partial products; one single pass at
  d <= 32 via the 4-group layout ``[qh ql qh ql].[kh kl kl kh]``), and PV
  runs ``ph@[vh|vl] + pl@[vh|vl]`` with a lane fold.  Result: ~1.5x (d=64) /
  ~3x (d=32) fewer MXU passes than bf16_3x AND slightly better accuracy
  (no dropped lo*lo term).  The packed operands stream from HBM as bf16
  pairs — the same byte count as the fp32 inputs they replace.

Numerics: QK^T and PV accumulate in float32 (``preferred_element_type``) with
float32 (m, l, acc) state, matching the reference's fp32-throughout behavior
while allowing bf16 inputs on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

import os as _os

# Masking strategy for tiles that may straddle the causal diagonal /
# window / kv_len boundary: "always" applies the (vector-scalar) mask
# unconditionally; "cond" branches around it at runtime — measured 2x
# SLOWER on v5e (serializes the Mosaic pipeline), kept only for A/B;
# "unsafe_none" (round-4 advisor finding: the old name "off" read like
# "disable mask-SKIPPING") drops the mask chain entirely — a TIMING-ONLY
# probe mode that returns WRONG outputs on boundary tiles, guarded by a
# loud warning below so it can never silently corrupt a production run.
_MASK_SKIP_MODE = _os.environ.get("FA_MASK_SKIP", "always")
if _MASK_SKIP_MODE == "off":  # old probe-mode name: refuse ambiguity
    raise ValueError(
        "FA_MASK_SKIP=off is ambiguous and was removed; use "
        "FA_MASK_SKIP=unsafe_none (timing-only, WRONG results on boundary "
        "tiles) or unset it for correct masking"
    )
if _MASK_SKIP_MODE == "unsafe_none":
    import warnings as _warnings

    _warnings.warn(
        "FA_MASK_SKIP=unsafe_none: causal/kv_len masking DISABLED — "
        "outputs on boundary tiles are WRONG.  Timing probes only "
        "(scripts/probe_causal.py).",
        stacklevel=1,
    )

__all__ = [
    "BlockSizes",
    "BlockMask",
    "flash_attention",
    "flash_attention_naive",
    "PRECISIONS",
    "resolve_precision",
    "resolve_q_seq_blocks",
]

NUM_LANES = 128
MIN_BLOCK = 128

PRECISIONS = ("bf16", "bf16_3x", "float32")


def resolve_precision(precision: str | None, dtype) -> str:
    """Resolve the matmul precision mode for the given input dtype.

    ``None``/"auto" -> "bf16_3x" for fp32 inputs (meets the reference's 1e-4
    kernel-lab tolerance at ~2x the speed of exact fp32), "bf16" for sub-fp32
    inputs (native MXU rate).  Sub-fp32 inputs always resolve to "bf16": the
    multi-pass emulations only exist to recover fp32 operand precision.
    """
    if precision in (None, "auto"):
        return "bf16_3x" if dtype == jnp.float32 else "bf16"
    if precision not in PRECISIONS:
        raise ValueError(f"precision must be one of {PRECISIONS}, got {precision!r}")
    if dtype != jnp.float32:
        return "bf16"
    return precision


def _split_bf16(x):
    """fp32 -> (hi, lo) bf16 pair with x ~= hi + lo (error ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _pack2(x):
    """fp32 (..., d) -> bf16 (..., 2d) = [hi | lo] along lanes (same bytes)."""
    hi, lo = _split_bf16(x)
    return jnp.concatenate([hi, lo], axis=-1)


def _dot_g(a, b, dims, mode, a_split=None, b_split=None):
    """dot_general with the precision-mode ladder; fp32 accumulation always.

    ``a_split``/``b_split`` let the caller hoist the (hi, lo) bf16 split of a
    loop-invariant operand out of the hot loop (e.g. Q across KV tiles).
    """
    f = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if mode == "float32":
        return f(
            a.astype(jnp.float32), b.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    if mode == "bf16":
        return f(a, b, precision=jax.lax.Precision.DEFAULT)
    # bf16_3x: split each fp32 operand; keep hi*hi + hi*lo + lo*hi.
    if a.dtype == jnp.float32:
        ah, al = a_split if a_split is not None else _split_bf16(a)
    else:
        ah, al = a, None
    if b.dtype == jnp.float32:
        bh, bl = b_split if b_split is not None else _split_bf16(b)
    else:
        bh, bl = b.astype(jnp.bfloat16), None
    out = f(ah, bh)
    if bl is not None:
        out += f(ah, bl)
    if al is not None:
        out += f(al, bh)
    return out


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tunable kernel config space.

    TPU analog of the reference's compile-time macro space
    ``d/B_r/B_c/BK/TM/TN/CACHE_Q`` (``src/flashattention.cu:15-24``):

    - ``block_q``   ~ B_r (rows of Q per grid step)
    - ``block_kv``  ~ B_c scaled to the MXU (KV rows loaded from HBM per step)
    - ``block_kv_compute`` ~ BK-style inner tile: KV rows per MXU matmul;
      must divide ``block_kv``.  Controls the VMEM footprint of the scores
      tile independently of HBM transfer granularity.
    - ``block_h``: heads per grid step (round 3; VERDICT #4).  Small-S
      shapes (1-2 (q, kv) steps per head) leave the pipeline dominated by
      per-step fixed costs and per-(head, q-block) init/epilogue; batching
      ``block_h`` independent heads into one grid step amortizes both and
      makes every DMA ``block_h``x larger.  No cross-head math: the kernel
      unrolls a per-head loop over sliced tiles (heads never share a
      contraction).  Must divide batch*heads; ignored on the triangular
      causal grid (long-S, where per-head grids are already deep).
    """

    block_q: int = 512
    block_kv: int = 2048
    block_kv_compute: int = 2048
    block_h: int = 1
    # PV-matmul contraction split (round 4): emit pv_split INDEPENDENT
    # partial-sum matmuls over block_kv_compute/pv_split KV rows each,
    # VPU-added at the end.  At d >= 128 the PV output is one 128-lane tile
    # fed by a single serial accumulation chain; independent chains give the
    # MXU work to interleave (measured v5e, d=128 S=2048 full-softmax
    # mini-kernel: 1.824 ms @ bq=1024/split=4 vs 1.99 @ split=1 —
    # measurements/probe_d128f.txt).  1 = off.
    pv_split: int = 1

    def __post_init__(self):
        if self.block_kv % self.block_kv_compute != 0:
            raise ValueError(
                f"block_kv ({self.block_kv}) must be a multiple of "
                f"block_kv_compute ({self.block_kv_compute})"
            )
        for name in ("block_q", "block_kv", "block_kv_compute"):
            val = getattr(self, name)
            if val % MIN_BLOCK != 0:
                raise ValueError(f"{name} ({val}) must be a multiple of {MIN_BLOCK}")
        if self.block_h < 1:
            raise ValueError(f"block_h ({self.block_h}) must be >= 1")
        if self.pv_split < 1 or self.block_kv_compute % (
            self.pv_split * MIN_BLOCK
        ):
            raise ValueError(
                f"pv_split ({self.pv_split}) must be >= 1 and split "
                f"block_kv_compute ({self.block_kv_compute}) into "
                f"{MIN_BLOCK}-multiples"
            )

    @classmethod
    def fit(
        cls,
        s_q: int,
        s_kv: int,
        head_dim: int,
        precision: str = "bf16",
        causal: bool = False,
        max_block_q: int | None = None,
        max_block_kv: int | None = None,
        n_heads: int | None = None,
    ) -> "BlockSizes":
        """Pick defaults that divide the (padded) problem and fit VMEM.

        Caps tuned empirically on TPU v5e (scripts/tune_flash.py,
        scripts/probe_d128.py).  Large blocks amortize per-grid-step
        overhead; block_q=1024 needs the raised scoped-VMEM limit the
        kernels request (vmem_limit_bytes) for the multi-pass precisions.
        At head_dim >= 128 the VPU softmax work per score element is the
        binding overhead and block_q=512 wins the measured sweep
        (d=128 S=2048: 1.92 ms @ 512/2048 vs 2.03 @ 1024/2048); sub-tiling
        (block_kv_compute < block_kv) LOSES everywhere at d=128 — the
        scratch-accumulator dependency serializes sub-tiles, so smaller
        matmuls only add overhead.  Causal caps block_kv at 1024: with the
        triangular pair grid the diagonal block's wasted compute scales with
        block_kv, and finer sub-tile (block_kv_compute) predication costs
        more than it saves (measured v5e S=8192 bf16: 2.24 ms @ 1024/1024
        or 2048/1024-substripes, 3.2 ms @ x/512).
        """
        # PV contraction split (round 4): the PV output is a single 128-lane
        # tile for every d <= 128, and its serial accumulation chain is the
        # measured thin-shape MXU bottleneck (measurements/D128_CEILING.md).
        # Independent partial-sum chains win at every measured shape:
        # d=128 S=2048 1.99 -> 1.82 ms (probe_d128f.txt), d=64 S=8192
        # non-causal 3.57 -> 3.23 ms and causal 2.22 -> 2.18 ms
        # (measurements/probe_pvsplit_d64.txt).
        pv_split = 2 if causal else 4
        auto_bq = max_block_q is None
        if auto_bq:
            max_block_q = 1024
        auto_bkv = max_block_kv is None
        if auto_bkv:
            max_block_kv = 2048
        # Small-shape lane-packed fp32 regime (round 5; VERDICT r4 #3): the
        # round-4 sweep (measurements/probe_small_fp32.txt) measured
        # bq=512/block_h=8/split=4 at 1.285 ms vs auto's 1.52 on the
        # reference's BH=128 S=1024 d=64 fp32 shape — halving block_q while
        # doubling the head fold keeps the same VMEM working set but shortens
        # the per-step serial chains of the 2-pass packed matmuls.  Gated on
        # n_heads (the forward dispatch path; the backward tunes its own
        # blocks and never passes n_heads).  d=64 only: the same sweep shows
        # d=32 preferring the full bq=1024 (1.071 ms vs 1.148 at bq=512) —
        # its packed matmuls are half as deep, so chain length never binds.
        small_packed = (
            precision == "bf16_3x"  # the measured (lane-packed) mode only
            and not causal
            and head_dim == 64
            and s_q <= 1024
            and n_heads is not None
            and n_heads % 8 == 0
        )
        if small_packed:
            max_block_q = min(max_block_q, 512)
        if head_dim >= 128:
            if causal:
                # Tri-grid sweeps found bq=512 best with the diagonal mix of
                # partial tiles (probe_d128 causal sweep).
                max_block_q = min(max_block_q, 512)
            else:
                # bq=1024 + the 4-way split beats every bq=512 config
                # (1.824 vs 1.95-2.02 ms at the Llama-7B shape).
                max_block_q = min(max_block_q, 1024)
        elif (
            precision == "bf16"
            and not causal
            and head_dim == 64
            and s_q >= 8192
            and auto_bq  # caller didn't constrain it
        ):
            # Long-S bf16 d=64 rect grid (round 5; VERDICT r4 #5): the
            # geometry sweep (measurements/probe_causal_geom.txt) measured
            # bq=2048 bkv=2048 split4 at 3.139 ms (87.6 TF/s, ceiling_frac
            # 0.89) vs the old bq=1024/bkv=2048 fit at 3.34-3.39 — doubling
            # block_q halves the per-q-block pipeline/bookkeeping cost.  The
            # tri grid measured the OPPOSITE (causal bq2048: 2.28 vs 2.17),
            # so causal keeps bq<=1024.
            max_block_q = 2048

        def largest_dividing(s, cap):
            # Largest MIN_BLOCK multiple <= cap dividing s (halving could land
            # on a non-MIN_BLOCK multiple, e.g. 384 -> 192); falls back to
            # MIN_BLOCK so non-128-multiple lengths hit the actionable
            # "use ops.dispatch for padding" error, not a block-shape one.
            b = min(cap, max(MIN_BLOCK, _round_up(s, MIN_BLOCK)))
            while b > MIN_BLOCK and s % b:
                b -= MIN_BLOCK
            return b

        block_q = largest_dividing(s_q, max_block_q)
        max_bkv = min(max_block_kv, 1024 if causal else 2048)
        block_kv = largest_dividing(s_kv, max_bkv)
        block_kv_compute = block_kv
        whole_s_kv = False
        if auto_bkv and precision == "bf16" and not causal:
            # Wide-DMA + substripe-compute regimes (round 5,
            # probe_d128_s4096.txt / probe_substripe_d64.txt): a KV DMA
            # block wider than the 2048 compute substripe cuts grid steps
            # at unchanged compute width, without the VMEM pressure of a
            # (bq, 4096+) score tile.  At d=64 the winning block is the
            # WHOLE sequence — K/V become grid-resident (the index map is
            # constant, so Pallas elides re-DMA across q blocks) and the
            # rate jumps to 0.91-0.99 of the shape ceiling (S=4096:
            # 0.871 -> 0.709 ms; S=8192: 3.147 -> 3.079).  At d=128 the
            # 2 MB/operand whole-S block loses at S=8192 (7.68 vs 6.85 ms);
            # bkv=4096 is the measured winner there (S=4096: 3.89 -> 3.42;
            # S=8192: 160.6 TF/s).
            if head_dim == 64 and 4096 <= s_kv <= 8192 and s_kv % 2048 == 0:
                block_kv = s_kv
                block_kv_compute = 2048
                block_q = largest_dividing(s_q, 2048)  # measured at bq=2048
                whole_s_kv = True
            elif head_dim == 128 and s_kv >= 4096 and s_kv % 4096 == 0:
                block_kv = 4096
                block_kv_compute = 2048
        elif (
            auto_bkv
            and precision == "bf16_3x"
            and not causal
            and head_dim == 64
            and s_kv >= 8192
            and s_kv % 4096 == 0
        ):
            # Lane-packed fp32 long-S (round 5, same wide-DMA mechanism,
            # measured at the reference fp32 headline shape): 7.76 -> 7.25
            # ms (bq1024/bkv4096/bkc2048).  Whole-S loses here (8.15 — the
            # 128-lane packed operands double the residency cost), as does
            # bq=2048; d=32 measured flat (fit already optimal).
            block_kv = 4096
            block_kv_compute = 2048
        block_h = 1
        if n_heads is not None and n_heads > 1:
            # Head batching (round 3; VERDICT #4): with <= 2 (q, kv) steps
            # per head the pipeline spends most of its time in per-step fixed
            # costs and init/epilogue ramp; fold several independent heads
            # into each grid step.  Cap chosen so the working set (tiles x
            # double-buffering + scratch) stays well under the 96 MB VMEM
            # budget at the shapes that trigger it (S <= ~2048).
            steps = -(-s_q // block_q) * -(-s_kv // block_kv)
            if small_packed and steps <= 2:
                # Measured winner keeps the full 8-head fold even at 2 grid
                # steps per head (probe_small_fp32.txt: bq512/bh8 1.285 ms
                # vs bq1024/bh4 1.314, bq1024/bh8 1.459).
                block_h = 8
            elif steps <= 2:
                cap = 8 // steps
                if whole_s_kv:
                    # Whole-S-resident KV regime: the big (bq, 2048)
                    # substripe tiles leave less VMEM slack; measured
                    # same-batch at d=64 S=4096: bh2 0.791 ms, bh1 0.824,
                    # bh4 0.888.
                    cap = min(cap, 2)
                while cap > 1 and n_heads % cap:
                    cap -= 1
                block_h = cap
        if block_kv_compute % (pv_split * MIN_BLOCK):
            pv_split = 1  # tiny kv blocks: nothing to split
        return cls(block_q, block_kv, block_kv_compute, block_h, pv_split)

    @classmethod
    def for_mask(cls, block_mask, n_heads: int | None = None) -> "BlockSizes":
        """Default blocks for a :class:`BlockMask` grid (round 5).

        Geometry is the mask's; pv_split follows the non-causal fit()
        default (the bm grid generalizes the tri grid — same serial-PV
        bottleneck); block_h batches heads when the mask leaves per-head
        rows SHALLOW (a band mask runs 2-3 grid steps per q block — the
        pipeline-ramp regime head folding amortizes; the dense-grid
        threshold in fit() is the same idea at steps <= 2).
        """
        bq, bkv = block_mask.block_q, block_mask.block_kv
        # Measured on the S=8192 band grid (probe_bm_blockh.txt): split2
        # beats split4 (1.371 vs 1.410 ms at block_h=4), matching the tri
        # grid's split2 preference at the same 1024 geometry.
        pv_split = 2 if bkv % (2 * MIN_BLOCK) == 0 else 1
        block_h = 1
        if n_heads is not None and n_heads > 1 and bq <= 1024:
            steps = block_mask.num_pairs / max(
                1, block_mask.s_q // bq
            )  # mean live kv blocks per q row
            if steps <= 4.0:
                # Shallow rows: head folding amortizes the pipeline ramp
                # (band w=1024: 1.487 -> 1.410 ms at block_h=4; block_h=8
                # regresses to 1.434).
                for cand in (4, 2):
                    if n_heads % cand == 0:
                        block_h = cand
                        break
        return cls(bq, bkv, bkv, block_h, pv_split)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BlockMask:
    """Block-sparse attention mask (round 4; VERDICT #8).

    Generalizes the triangular-causal pair-table grid into a user-defined
    block-sparsity engine: the grid's pair dimension enumerates ONLY the
    (q block, kv block) pairs with at least one live element, so dead blocks
    never enter the pipeline — grid step count is proportional to live
    blocks, the property the causal tri grid has for the lower triangle.
    Covers the mask families segment ids cannot express: prefix-LM,
    strided/dilated sparsity, arbitrary document masks.

    Built from a *position-level* predicate via :meth:`from_mask_fn`; the
    same predicate classifies blocks host-side (numpy) and masks partial
    blocks in-kernel (jnp) — one source of truth, no dual encoding.  The
    kernel applies the element mask only when at least one live pair is
    partial (``needs_element_mask``); pure block-granular masks skip the
    VPU select chain entirely.

    Hashable (a jit-static argument): tables are tuples, ``mask_fn`` hashes
    by identity — define it at module level (a fresh lambda per call would
    recompile).
    """

    s_q: int
    s_kv: int
    block_q: int
    block_kv: int
    qi: tuple[int, ...]        # live-pair q-block indices (qi-major sorted)
    kj: tuple[int, ...]        # live-pair kv-block indices
    first_kj: tuple[int, ...]  # per q block: first live kj (init trigger)
    last_kj: tuple[int, ...]   # per q block: last live kj (epilogue trigger)
    needs_element_mask: bool   # any live pair only partially live?
    mask_fn: Any               # (q_pos, kv_pos) int arrays -> bool array
    element_live_fraction: float = 1.0  # live ELEMENTS / (s_q * s_kv)

    @classmethod
    def from_mask_fn(
        cls,
        mask_fn,
        s_q: int,
        s_kv: int,
        *,
        block_q: int = 1024,
        block_kv: int = 1024,
    ) -> "BlockMask":
        """Classify every (q, kv) block of ``mask_fn`` as dead/full/partial.

        ``mask_fn(q_pos, kv_pos) -> bool`` must be dual-use: it is evaluated
        on numpy int arrays here (block classification) and traced on jnp
        iota tiles inside the kernel (partial-block masking) — plain
        comparisons/arithmetic/logic ops satisfy both.

        Raises if any query row attends no key (its softmax is undefined).
        """
        block_q = min(block_q, _round_up(s_q, MIN_BLOCK))
        block_kv = min(block_kv, _round_up(s_kv, MIN_BLOCK))
        if s_q % block_q or s_kv % block_kv:
            raise ValueError(
                f"sequence lengths ({s_q}, {s_kv}) must be multiples of the "
                f"mask block sizes ({block_q}, {block_kv})"
            )
        nq, nkv = s_q // block_q, s_kv // block_kv
        qi, kj = [], []
        first_kj = [-1] * nq
        last_kj = [0] * nq
        needs_element_mask = False
        n_live_elements = 0
        for i in range(nq):
            rows = np.arange(i * block_q, (i + 1) * block_q)[:, None]
            row_live = np.zeros(block_q, bool)
            for j in range(nkv):
                cols = np.arange(j * block_kv, (j + 1) * block_kv)[None, :]
                m = np.asarray(mask_fn(rows, cols), bool)
                if m.shape != (block_q, block_kv):
                    raise ValueError(
                        f"mask_fn must broadcast to (block_q, block_kv)="
                        f"({block_q}, {block_kv}), got {m.shape}"
                    )
                if not m.any():
                    continue
                qi.append(i)
                kj.append(j)
                if first_kj[i] < 0:
                    first_kj[i] = j
                last_kj[i] = j
                row_live |= m.any(axis=1)
                n_live_elements += int(m.sum())
                if not m.all():
                    needs_element_mask = True
            if not row_live.all():
                bad = int(np.argmin(row_live)) + i * block_q
                raise ValueError(
                    f"mask_fn leaves query row {bad} with no live key — its "
                    "softmax is undefined; give every query at least one key"
                )
        return cls(
            s_q=s_q,
            s_kv=s_kv,
            block_q=block_q,
            block_kv=block_kv,
            qi=tuple(qi),
            kj=tuple(kj),
            first_kj=tuple(first_kj),
            last_kj=tuple(last_kj),
            needs_element_mask=needs_element_mask,
            mask_fn=mask_fn,
            element_live_fraction=n_live_elements / (s_q * s_kv),
        )

    @property
    def num_pairs(self) -> int:
        return len(self.qi)

    @property
    def live_fraction(self) -> float:
        """Fraction of the dense block grid the kernel actually executes."""
        return self.num_pairs / ((self.s_q // self.block_q) * (self.s_kv // self.block_kv))

    @property
    def occupancy(self) -> float:
        """Live elements / executed elements (1.0 = no partial-block waste).

        Round 5 (VERDICT r4 #4): honest live-FLOPs accounting.  The kernel
        executes ``live_fraction`` of the dense grid, but only
        ``element_live_fraction`` of the dense SCORES are live — the gap is
        masked work inside partial blocks.  Efficiency on live flops can
        never exceed ``occupancy`` times the executed-rate efficiency, so
        bench rows report both.
        """
        return self.element_live_fraction / max(self.live_fraction, 1e-12)


def dropout_keep_mask(seed, bh_idx, row_start, col_start, shape, rate: float):
    """Deterministic keep-mask tile for attention dropout (round 3).

    Counter-based RNG keyed on the ABSOLUTE coordinates (seed, batch*head,
    query row, kv column): the same bit is regenerated anywhere it is
    evaluated — forward kernel, both backward kernels, and the pure-jnp test
    oracle — so the (S_q, S_kv) mask is never materialized in HBM (the
    flash-attention dropout memory property).  Implemented as a murmur-style
    32-bit finalizer in plain uint32 jnp ops because ``pltpu.prng_random_bits``
    has no CPU lowering and its TPU-interpret emulation returns zeros —
    this hash is bitwise identical under the Pallas interpreter and Mosaic,
    which is what keeps the differential test suite honest.

    Returns a bool tile of ``shape``: True = keep (probability ``1 - rate``).
    """
    u32 = jnp.uint32
    gi = (row_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)).astype(u32)
    gj = (col_start + jax.lax.broadcasted_iota(jnp.int32, shape, 1)).astype(u32)
    h = jnp.asarray(seed, u32) * u32(0x9E3779B9) + jnp.asarray(
        bh_idx, u32
    ) * u32(0x85EBCA6B)
    x = (gi * u32(0xCC9E2D51)) ^ (gj * u32(0x1B873593)) ^ h
    # murmur3 fmix32: full-avalanche finalizer (each input bit flips each
    # output bit w.p. ~1/2) — adequate statistical quality for dropout.
    x = x ^ (x >> 16)
    x = x * u32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * u32(0xC2B2AE35)
    x = x ^ (x >> 16)
    # Top 24 bits -> uniform integer in [0, 2^24); keep iff n/2^24 >= rate.
    # The compare stays in the integer domain (Mosaic has no uint32->f32
    # cast; caught by the round-3 compiled selftest).  The threshold below
    # is EXACTLY equivalent to the f32 compare `n * 2^-24 >= f32(rate)`:
    # n/2^24 is exact in f32 (24-bit mantissa, power-of-2 divide), so the
    # predicate is n >= ceil(f32(rate) * 2^24).
    threshold = math.ceil(float(np.float32(rate)) * (1 << 24))
    return (x >> 8) >= u32(min(threshold, (1 << 24)))


def resolve_q_seq_blocks(s_q: int, block_q: int, q_seq_len: int | None) -> int | None:
    """Blocks per GQA group segment (None = no folding); validates the fold."""
    if q_seq_len is None:
        return None
    if s_q % q_seq_len or q_seq_len % block_q:
        raise ValueError(
            f"q_seq_len ({q_seq_len}) must divide s_q ({s_q}) and be a "
            f"multiple of block_q ({block_q})"
        )
    return q_seq_len // block_q if q_seq_len != s_q else None


def _kernel(
    qoff_ref,
    *rest,
    causal: bool,
    scale: float,
    block_kv_compute: int,
    has_kv_len: bool,
    num_kv_blocks: int,
    save_residuals: bool,
    quantized: bool,
    lsum_mxu: bool,
    head_dim: int,
    precision: str,
    q_seq_blocks: int | None,
    packed: bool = False,
    tri: bool = False,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    has_segments: bool = False,
    one_shot: bool = False,
    bm: bool = False,
    bm_mask_fn=None,
    bm_element_mask: bool = False,
    pv_split: int = 1,
):
    """Grid = (batch*heads, num_q_blocks, num_kv_blocks); kv dim is sequential.

    Per grid step: one (block_q, d) Q tile against one (block_kv, d) K/V tile,
    with the online-softmax state (m, l, acc) carried in VMEM scratch across
    the kv dimension — the same loop body as the reference's per-KV-block
    iteration (``src/flashattention.cu:214-342``), with the MXU playing the
    role of the TM x TN register tiles.

    When ``lsum_mxu`` (head_dim < 128, unquantized), v_ref holds V extended to
    128 lanes with a ones-column at ``head_dim``: the PV matmul then computes
    the row-sum l in an otherwise-idle output lane and there is no l scratch —
    acc[:, head_dim] IS l, updated by the same alpha-rescale recurrence.
    """
    rest = list(rest)
    if tri:
        qi_ref, kj_ref = rest.pop(0), rest.pop(0)
    elif bm:
        # Block-sparse pair grid (round 4; VERDICT #8): pair tables like tri,
        # plus per-q-block first/last live-kj tables driving init/epilogue
        # (the tri grid derives those analytically from the diagonal).
        qi_ref, kj_ref = rest.pop(0), rest.pop(0)
        bm_first_ref, bm_last_ref = rest.pop(0), rest.pop(0)
    q_ref, k_ref, v_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if quantized:
        # Per-token dequant scales for the int8/fp8 KV payloads; folded into
        # the score/p tiles below, so the MXU matmuls run on the raw payloads.
        k_scales_ref = rest.pop(0)
        v_scales_ref = rest.pop(0)
    if has_segments:
        # Packed sequences (round 3): q rows attend only kv columns of the
        # SAME segment id.  Layouts chosen so the in-kernel compare is a pure
        # broadcast (no transposes): q ids ride as a (bq, 1) sublane column,
        # kv ids as a (1, bkv) lane row.
        seg_q_ref = rest.pop(0)
        seg_kv_ref = rest.pop(0)
    o_ref = rest.pop(0)
    if save_residuals:
        l_ref, m_ref = rest.pop(0), rest.pop(0)
    if one_shot:
        # Single KV block per q row (round 3; VERDICT #1/#4): no carried
        # online-softmax state, so the kernel takes the stateless fast path —
        # no VMEM scratch, no (m, l) 128-lane broadcast stores, no alpha
        # rescale of a zero accumulator, no separate epilogue read-back.
        m_scratch = l_scratch = acc_scratch = None
    elif lsum_mxu:
        m_scratch, acc_scratch = rest
        l_scratch = None
    else:
        m_scratch, l_scratch, acc_scratch = rest

    # q_offset and kv_len are prefetched scalars (traced), so ONE compiled
    # program serves any offset/length — ring/CP shards and chunked prefill
    # reuse it instead of compiling per-offset/per-chunk specializations
    # (round 2; VERDICT #6).
    q_offset = qoff_ref[0]
    kv_len = qoff_ref[1] if has_kv_len else None
    block_h = q_ref.shape[0]  # heads per grid step (VERDICT #4); see BlockSizes
    block_q = q_ref.shape[1]
    bh_base = pl.program_id(0) * block_h  # hoisted: program_id is illegal
    #   inside the pl.when(should_run) branch under the CPU interpreter
    block_kv = k_ref.shape[1]
    if tri or bm:
        # Triangular causal grid (round 2): the 1D pair dimension enumerates
        # ONLY the (q block, kv block) pairs at/below the diagonal via the
        # prefetched tables, so above-diagonal steps never enter the pipeline
        # at all (the rectangular grid paid a per-step cost even for skipped
        # steps — ~0.5 ms of the S=8192 bf16 causal headline).  The bm
        # (block-sparse) grid is the same machinery with user-defined pairs.
        pair = pl.program_id(1)
        q_idx = qi_ref[pair]
        kv_idx = kj_ref[pair]
        q_raw = q_idx  # tri/bm imply no GQA fold: raw == causal position
    else:
        q_idx = pl.program_id(1)
        q_raw = q_idx  # RAW grid index: the dropout-mask row coordinate
        #   (folded GQA heads share q_idx after the rem below but must draw
        #   independent dropout bits; backward uses the same raw index).
        if q_seq_blocks is not None:
            # GQA row folding: Q carries G query-head groups stacked along
            # rows, each a q_seq_blocks-block segment; causal position depends
            # on the block index *within* the segment.
            q_idx = jax.lax.rem(q_idx, q_seq_blocks)
        kv_idx = pl.program_id(2)

    if tri and window is not None:
        # The windowed pair table starts each q row at its first in-window
        # KV block, not at 0 — init must fire there (q_offset is a static 0
        # whenever tri is on).
        first_kv = jnp.maximum(0, (q_idx * block_q - window + 1) // block_kv)
    elif bm:
        first_kv = bm_first_ref[q_idx]
    else:
        first_kv = 0

    if not one_shot:

        @pl.when(kv_idx == first_kv)
        def _init():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)
            if l_scratch is not None:
                l_scratch[...] = jnp.zeros_like(l_scratch)

    if causal and not tri:
        # Run only if some element of this tile is at/below the diagonal:
        # last q row of the tile >= first kv col of the tile.
        # (block-skip ~ src/flashattention.cu:434)
        should_run = (q_offset + (q_idx + 1) * block_q - 1) >= (kv_idx * block_kv)
    else:
        should_run = True
    if window is not None:
        # Sliding window: the tile is dead when its last kv col falls before
        # the window of the block's FIRST row.
        win_run = ((kv_idx + 1) * block_kv - 1) >= (
            q_offset + q_idx * block_q - window + 1
        )
        should_run = win_run if should_run is True else (should_run & win_run)
    if has_kv_len:
        # Blocks entirely past the (traced) KV length contribute nothing:
        # skip their compute too (their DMA is already clamped away).
        len_run = kv_idx * block_kv < kv_len
        should_run = len_run if should_run is True else (should_run & len_run)

    dims_nt = (((1,), (1,)), ((), ()))  # contract last dims (q . k^T)
    dims_nn = (((1,), (0,)), ((), ()))  # plain matmul (p @ v)

    def _run_head(h):
        r0 = h * block_q  # this head's row band in the shared scratch
        rows = slice(r0, r0 + block_q)
        q = q_ref[h]  # (block_q, d); packed: (block_q, 2d) bf16 [qh|ql]
        if packed and head_dim <= NUM_LANES // 4:
            # 4-group layout: [qh|ql|qh|ql] vs [kh|kl|kl|kh] yields all four
            # hi/lo partial products in ONE full-width contraction.
            q = jnp.concatenate([q, q], axis=1)
        # Q's (hi, lo) split is KV-loop-invariant: hoist it (bf16_3x only).
        q_split = (
            _split_bf16(q)
            if precision == "bf16_3x" and q.dtype == jnp.float32
            else None
        )

        def _scores(start):
            k = k_ref[h, start : start + block_kv_compute, :]
            if packed:
                # k = [kh|kl] bf16 (bkv_c, 2d); the swapped copy pairs each
                # operand half against the other's opposite half.
                k_swap = jnp.concatenate(
                    [k[:, head_dim:], k[:, :head_dim]], axis=1
                )
                if head_dim <= NUM_LANES // 4:
                    s = jax.lax.dot_general(
                        q,
                        jnp.concatenate([k, k_swap], axis=1),
                        dims_nt,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    s = jax.lax.dot_general(
                        q, k, dims_nt, preferred_element_type=jnp.float32
                    ) + jax.lax.dot_general(
                        q, k_swap, dims_nt, preferred_element_type=jnp.float32
                    )
            elif quantized:
                # MXU can't contract f32 x int8 directly; run the payload as
                # bf16 (exact for int8 values in [-127,127] and fp8) and fold
                # the per-token scale into the score *columns* afterwards:
                # s_ij = (q_i . k_j_payload) * k_scale_j.  The precision mode
                # still governs the fp32 Q stream (bf16_3x splits q; float32
                # upcasts the payload).
                k = k.astype(jnp.bfloat16)
                if precision == "bf16":
                    s = _dot_g(q.astype(jnp.bfloat16), k, dims_nt, "bf16")
                else:
                    s = _dot_g(q, k, dims_nt, precision, a_split=q_split)
                s = s * k_scales_ref[h, :, start : start + block_kv_compute]
            else:
                s = _dot_g(q, k, dims_nt, precision, a_split=q_split)
            if scale != 1.0:
                s = s * scale
            if logit_softcap is not None:
                # Gemma-2-style capping: s -> cap * tanh(s / cap).
                s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))

            if has_segments:
                # Same-segment mask: unconditionally applied (segment
                # boundaries are data, so no tile can be proven mask-free at
                # trace time the way interior causal tiles can).
                seg_q = seg_q_ref[h]  # (bq, 1)
                seg_k = seg_kv_ref[h, :, start : start + block_kv_compute]
                s = s + jnp.where(seg_q == seg_k, 0.0, DEFAULT_MASK_VALUE)

            if bm and bm_element_mask:
                # Block-sparse element mask: mask_fn re-evaluated on iota
                # position tiles — the same predicate that classified blocks
                # host-side.  Applied unconditionally on every live pair
                # (branching on a prefetched partial flag would serialize the
                # Mosaic pipeline, the measured 2x loss of _MASK_SKIP_MODE=
                # "cond"); pure block-granular masks never enter this path.
                r_pos = q_idx * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv_compute), 0
                )
                c_pos = kv_idx * block_kv + start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv_compute), 1
                )
                s = jnp.where(bm_mask_fn(r_pos, c_pos), s, DEFAULT_MASK_VALUE)

            kv_start = kv_idx * block_kv + start
            if causal or has_kv_len:
                # Diagonal-only masking (round 3; VERDICT #2): grid ids are
                # traced, so the "tile needs no mask" shortcut can't be a
                # trace-time decision — but it CAN be a cheap runtime branch.
                # A tile is mask-free iff it is fully below the diagonal,
                # fully inside the window, and fully below the KV length; the
                # (majority) mask-free tiles then skip the iota/compare/
                # select VPU chain entirely instead of "hiding" it under the
                # MXU (at d=64 the VPU is the busier unit and the hide was
                # costing ~8% of the causal headline).
                need = None

                def _or(a, b):
                    return b if a is None else (a | b)

                if causal:
                    need = _or(
                        need,
                        kv_start + block_kv_compute - 1
                        > q_offset + q_idx * block_q,
                    )
                    if window is not None:
                        need = _or(
                            need,
                            kv_start
                            <= q_offset + (q_idx + 1) * block_q - 1 - window,
                        )
                if has_kv_len:
                    need = _or(need, kv_start + block_kv_compute > kv_len)

                def _apply(s):
                    # Vector-scalar masking (round 3): every predicate is a
                    # CONSTANT iota tile compared against a traced SCALAR, so
                    # Mosaic hoists the tile out of the loop and each
                    # condition costs one vector compare.  keep(c <= r) with
                    # r = q_start + i, c = kv_start + j  <=>
                    # (j - i) <= q_start - kv_start.  (~ src/flashattention.cu:478-487)
                    mask = None
                    if causal:
                        dji = jax.lax.broadcasted_iota(
                            jnp.int32, s.shape, 1
                        ) - jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                        c_lim = q_offset + q_idx * block_q - kv_start
                        mask = dji <= c_lim
                        if window is not None:
                            mask = mask & (dji > c_lim - window)
                    if has_kv_len:
                        col_iota = jax.lax.broadcasted_iota(
                            jnp.int32, s.shape, 1
                        )
                        len_mask = col_iota < kv_len - kv_start
                        mask = len_mask if mask is None else (mask & len_mask)
                    return jnp.where(mask, s, DEFAULT_MASK_VALUE)

                if _MASK_SKIP_MODE == "unsafe_none":
                    # TIMING-ONLY probe mode (scripts/probe_causal.py):
                    # skips the mask chain entirely, so diagonal tiles give
                    # WRONG results.  Isolates the vector-scalar mask's VPU
                    # cost from the tri-grid's other per-step overheads.
                    del need
                elif _MASK_SKIP_MODE == "cond":
                    # Measured on v5e and REJECTED as the default: branching
                    # around the mask serializes Mosaic's software pipeline
                    # (causal bf16 S=8192: 4.30 ms vs 2.30 unconditional).
                    s = jax.lax.cond(need, _apply, lambda s: s, s)
                else:
                    del need
                    s = _apply(s)
            return s

        def _dropout(p, start):
            # Attention dropout (round 3): drop UNNORMALIZED p entries fed to
            # the PV matmul with inverted 1/(1-rate) scaling; the softmax
            # denominator l stays the UNdropped row sum (dropout applies to
            # the normalized weights, and l is the normalizer) — the host
            # disables the MXU ones-lane row sum when dropout is on so l
            # never sees the dropped tile.
            if dropout_rate is None:
                return p
            keep = dropout_keep_mask(
                qoff_ref[2],
                bh_base + h,
                q_raw * block_q,
                kv_idx * block_kv + start,
                p.shape,
                dropout_rate,
            )
            return jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))

        def _pv_mm(p_v, start):
            # PV matmul on the (possibly dropped) p tile; returns (pv, l_add)
            # where l_add is the MXU ones-lane row sum when available.
            v = v_ref[h, start : start + block_kv_compute, :]
            l_add = None
            if packed:
                # v = [vh|vl] (bkv_c, 2d) bf16 (+ a ones lane when it fits):
                # p's own (hi, lo) split against it gives all four partial
                # products in two full-width passes; fold the lane halves.
                p_hi = p_v.astype(jnp.bfloat16)
                p_lo = (p_v - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                raw = lambda a, b: jax.lax.dot_general(
                    a, b, dims_nn, preferred_element_type=jnp.float32
                )
                pv2 = _split_sum(raw, p_hi, v) + _split_sum(raw, p_lo, v)
                pv = pv2[:, :head_dim] + pv2[:, head_dim : 2 * head_dim]
                if v.shape[-1] > 2 * head_dim:  # MXU-computed row sum lane
                    l_add = pv2[:, 2 * head_dim : 2 * head_dim + 1]
            elif quantized:
                # Fold the V dequant scale into p (o_d = sum_j p_j*s_j*v_jd):
                # one VPU row-scale instead of dequantizing the whole V tile.
                v = v.astype(jnp.bfloat16)
                p_scaled = (
                    p_v * v_scales_ref[h, :, start : start + block_kv_compute]
                )
                if precision == "bf16":
                    pv = _pv_dot(p_scaled.astype(jnp.bfloat16), v, "bf16")
                else:
                    pv = _pv_dot(p_scaled, v, precision)
            else:
                pv = _pv_dot(p_v, v, precision)
            return pv, l_add

        def _split_sum(f, a, b):
            # pv_split (round 4): independent partial-sum chains over the PV
            # contraction — the PV output is a single 128-lane tile at
            # d <= 128 and its serial accumulation chain is the measured MXU
            # bottleneck (measurements/D128_CEILING.md); splitting gives
            # Mosaic interleavable chains.  VPU cost: (pv_split-1) tile adds.
            n = pv_split
            if n == 1 or b.shape[0] % n:
                return f(a, b)
            c = b.shape[0] // n
            out = f(a[:, :c], b[:c])
            for i in range(1, n):
                out = out + f(a[:, i * c : (i + 1) * c], b[i * c : (i + 1) * c])
            return out

        def _pv_dot(p_v, v, mode):
            return _split_sum(
                lambda a, b: _dot_g(a, b, dims_nn, mode), p_v, v
            )

        if one_shot:
            # Stateless single-KV-block path: softmax in registers, direct
            # store — no scratch round trips, no recurrence (see _kernel).
            s = _scores(0)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            pv, l_add = _pv_mm(_dropout(p, 0), 0)
            if lsum_mxu:
                l = pv[:, head_dim : head_dim + 1]
            elif l_add is not None:
                l = l_add
            else:
                l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[h] = (pv[:, :head_dim] * l_inv).astype(o_ref.dtype)
            if save_residuals:
                l_ref[h] = jnp.broadcast_to(l, l_ref.shape[1:]).astype(
                    l_ref.dtype
                )
                m_ref[h] = jnp.broadcast_to(m, m_ref.shape[1:]).astype(
                    m_ref.dtype
                )
            return

        def _sub_tile(start):
            s = _scores(start)

            m_prev = m_scratch[rows, 0:1]  # (block_q, 1) replicated state
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)  # rescale of old state
            # NB (round 3): exponentiating on half-width bf16 vregs
            # (p = exp((s - m).astype(bf16))) was measured and LOSES ~10%
            # end-to-end on v5e despite touching half the data — the extra
            # convert breaks the fused sub+exp chain and bf16 VPU transcend-
            # entals are not 2x rate.  Keep the f32 softmax pipeline.
            p = jnp.exp(s - m_next)
            m_scratch[rows, :] = jnp.broadcast_to(
                m_next, (block_q, m_scratch.shape[1])
            )

            pv, l_add = _pv_mm(_dropout(p, start), start)
            if l_scratch is not None:
                if l_add is None:
                    l_add = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                l_next = alpha * l_scratch[rows, 0:1] + l_add
                l_scratch[rows, :] = jnp.broadcast_to(
                    l_next, (block_q, l_scratch.shape[1])
                )
            # Unnormalized accumulator; rescale old contribution by alpha and
            # divide by l once in the epilogue (~ src/flashattention.cu:346-354).
            # Under lsum_mxu, column head_dim of pv is sum(p): l shares the
            # recurrence.
            acc_scratch[rows, :] = acc_scratch[rows, :] * alpha + pv

        # NB (round 3): splitting the q rows into independent per-sub-tile
        # online-softmax chains (shorter VPU live ranges, interleavable
        # MXU/VPU chains) was built and measured: it LOSES monotonically
        # (d=128 S=2048: 1.99/2.09/2.37 ms at 1/2/4-way; d=64 S=8192:
        # 3.35/3.46/3.69).  Mosaic already pipelines across sub-tiles; the
        # split only adds scratch-indexing overhead.  Reverted.
        for start in range(0, block_kv, block_kv_compute):
            if (causal or has_kv_len) and block_kv_compute < block_kv:
                # Sub-tile diagonal skip: predicate each block_kv_compute
                # column stripe on intersecting the causal triangle (and the
                # traced KV length), so a large block_kv (good: fewer grid
                # steps, bigger DMAs) no longer pays block_kv/2 columns of
                # wasted diagonal compute — the fine-grained analog of the
                # reference's whole-block skip (src/flashattention.cu:434).
                run_sub = True
                if causal:
                    run_sub = (q_offset + (q_idx + 1) * block_q - 1) >= (
                        kv_idx * block_kv + start
                    )
                if window is not None:
                    win_sub = (kv_idx * block_kv + start + block_kv_compute - 1) >= (
                        q_offset + q_idx * block_q - window + 1
                    )
                    run_sub = win_sub if run_sub is True else (run_sub & win_sub)
                if has_kv_len:
                    len_sub = kv_idx * block_kv + start < kv_len
                    run_sub = len_sub if run_sub is True else (run_sub & len_sub)
                pl.when(run_sub)(functools.partial(_sub_tile, start))
            else:
                _sub_tile(start)

    @pl.when(should_run)
    def _run():
        # block_h > 1 (VERDICT #4): unroll over the heads batched into this
        # grid step.  Heads are independent — each keeps its online-softmax
        # state in a disjoint row band of the shared scratch — so this is
        # pure per-step-overhead amortization, never a fused contraction.
        for h in range(block_h):
            _run_head(h)

    if one_shot:
        return  # _run_head stored o (and residuals) directly

    if tri:
        last_kv = jnp.minimum(
            num_kv_blocks - 1, ((q_idx + 1) * block_q - 1) // block_kv
        )
    elif bm:
        last_kv = bm_last_ref[q_idx]
    else:
        last_kv = num_kv_blocks - 1

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        for h in range(block_h):
            rows = slice(h * block_q, (h + 1) * block_q)
            if lsum_mxu:
                l = acc_scratch[rows, head_dim : head_dim + 1]
            else:
                l = l_scratch[rows, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[h] = (acc_scratch[rows, :head_dim] * l_inv).astype(o_ref.dtype)
            if save_residuals:
                l_ref[h] = jnp.broadcast_to(l, l_ref.shape[1:]).astype(
                    l_ref.dtype
                )
                m_ref[h] = m_scratch[rows, :].astype(m_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    *,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    kv_len: int | jax.Array | None = None,
    q_offset: int | jax.Array = 0,
    save_residuals: bool = False,
    precision: str | None = None,
    q_seq_len: int | None = None,
    interpret: bool | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    dropout_seed=0,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    block_mask: BlockMask | None = None,
) -> Any:
    """Fused flash attention forward on (BH, S, d) tensors (see _flash_attention).

    Thin un-jitted shim: the triangular-causal-grid eligibility depends on
    ``q_offset`` being a *concrete* zero, which must be decided OUTSIDE the
    jit boundary (inside it, an explicitly-passed 0 is a tracer and the check
    would silently disable the optimization for every caller that names the
    kwarg — the public dispatch path does; round-2 review finding).
    """
    if window is not None and not causal:
        raise ValueError("window (sliding-window attention) requires causal=True")
    if dropout_rate == 0.0:
        dropout_rate = None  # rate 0 is the identity, not an error
    tri_ok = (
        causal
        and isinstance(q_offset, int)
        and q_offset == 0
        and q_seq_len is None
        and kv_len is None
    )
    return _flash_attention(
        q,
        k,
        v,
        k_scales,
        v_scales,
        causal=causal,
        scale=scale,
        block_sizes=block_sizes,
        kv_len=kv_len,
        q_offset=q_offset,
        save_residuals=save_residuals,
        precision=precision,
        q_seq_len=q_seq_len,
        interpret=interpret,
        tri_ok=tri_ok,
        window=window,
        logit_softcap=logit_softcap,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        block_mask=block_mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "scale",
        "block_sizes",
        "save_residuals",
        "precision",
        "q_seq_len",
        "interpret",
        "tri_ok",
        "window",
        "logit_softcap",
        "dropout_rate",
        "block_mask",
    ),
)
def _flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    *,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    kv_len: int | jax.Array | None = None,
    q_offset: int | jax.Array = 0,
    save_residuals: bool = False,
    precision: str | None = None,
    q_seq_len: int | None = None,
    interpret: bool | None = None,
    tri_ok: bool = False,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    dropout_seed=0,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    block_mask: BlockMask | None = None,
) -> Any:
    """Fused flash attention forward on (BH, S, d) tensors.

    Low-level entry: expects batch/head already folded (the reference's caller
    convention, ``bench_flashattention.py:31-33``) and sequence lengths already
    padded to multiples of the block sizes (use :mod:`ops.dispatch` for the
    padded/shape-polymorphic public API).

    Args:
      q: (BH, S_q, d); k, v: (BH, S_kv, d).  When ``k_scales``/``v_scales``
        are given (each (BH, S_kv), float32), k/v are treated as quantized
        payloads (int8 or fp8) and dequantized *inside* the kernel, fused
        into the score/p tiles (the quantized-KV-cache path of BASELINE.json;
        KV HBM traffic drops 2-4x vs bf16/fp32).
      causal: causal masking with query i at absolute position ``q_offset + i``.
        ``q_offset`` may be a traced int32 scalar: it enters the kernel via
        scalar prefetch, so one compiled program serves every offset (ring /
        context-parallel shards, chunked prefill).
      scale: score scale; 1.0 is reference-parity (``src/flashattention.cu:586``),
        pass ``d**-0.5`` for standard SDPA.
      kv_len: mask KV columns >= kv_len (ragged-tail support).  May be a
        traced int32 scalar (scalar-prefetched like q_offset): blocks past it
        are skipped (compute AND DMA), so a fixed-capacity KV buffer costs
        only its *live* prefix — chunked prefill runs one program per shape
        bucket instead of one per chunk index.
      save_residuals: also return (l, m) in float32, each (BH, S_q).
      precision: matmul precision mode for fp32 inputs — "bf16" (1 MXU pass),
        "bf16_3x" (default; 3-pass split, ~1e-5 error), "float32" (exact).
        Ignored (native 1-pass) for bf16 inputs.  See the module docstring.
      q_seq_len: GQA row folding — q holds G = S_q // q_seq_len query-head
        groups stacked along the row dim, all attending to the *same* K/V
        (position of row r is ``r % q_seq_len``).  This is how grouped-query
        attention runs without materializing repeated KV heads: fold
        (B, KVH, G, S, d) -> (B*KVH, G*S, d) and pass q_seq_len=S.  Requires
        q_seq_len % block_q == 0.
      interpret: run the Pallas interpreter (auto-on when not on TPU, so the
        same code path is testable on CPU meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate is not None:
        if not 0.0 < dropout_rate < 1.0:
            raise ValueError(
                f"dropout_rate must be in (0, 1) or None (got {dropout_rate})"
            )
        # NB: with dropout, the (l, m) residuals are the UNdropped softmax
        # statistics — exactly what the backward kernels need (p = exp(s -
        # lse) reconstructs the normalized undropped P, and the dropout mask
        # is regenerated from the seed).

    bh, s_q, d = q.shape
    bh_kv, s_kv, dk = k.shape
    if k.shape != v.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} vs {v.shape}")
    if dk != d:
        raise ValueError(f"q/k head_dim mismatch: {d} vs {dk}")
    if bh_kv != bh:
        raise ValueError(f"q/k batch*heads mismatch: {bh} vs {bh_kv}")
    has_segments = q_segment_ids is not None
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError(
            "q_segment_ids and kv_segment_ids must be given together"
        )
    if has_segments:
        if q_segment_ids.shape != (bh, s_q):
            raise ValueError(
                f"q_segment_ids must be (BH, S_q)=({bh}, {s_q}), got "
                f"{q_segment_ids.shape}"
            )
        if kv_segment_ids.shape != (bh, s_kv):
            raise ValueError(
                f"kv_segment_ids must be (BH, S_kv)=({bh}, {s_kv}), got "
                f"{kv_segment_ids.shape}"
            )
    bm = block_mask is not None
    if bm:
        # Block-sparse pair grid (round 4; VERDICT #8): user-defined mask
        # families beyond causal.  Orthogonal features (segments, dropout,
        # quantized KV, kv_len) compose; causal/window belong IN the mask_fn;
        # the GQA row fold would break the pair-position identity.
        if causal or window is not None:
            raise ValueError(
                "block_mask is mutually exclusive with causal/window — "
                "encode them in the mask_fn"
            )
        if q_seq_len is not None:
            raise ValueError(
                "block_mask with the GQA row fold (q_seq_len) is not "
                "supported; un-fold or bake the fold into the mask"
            )
        if (block_mask.s_q, block_mask.s_kv) != (s_q, s_kv):
            raise ValueError(
                f"block_mask built for (S_q, S_kv)=({block_mask.s_q}, "
                f"{block_mask.s_kv}) but inputs are ({s_q}, {s_kv})"
            )
        if block_sizes is None:
            block_sizes = BlockSizes.for_mask(block_mask, n_heads=bh)
        elif (
            block_sizes.block_q != block_mask.block_q
            or block_sizes.block_kv != block_mask.block_kv
        ):
            raise ValueError(
                f"block_sizes {block_sizes} disagree with block_mask blocks "
                f"({block_mask.block_q}, {block_mask.block_kv}); rebuild the "
                "mask at the desired block shape"
            )
    quantized = k_scales is not None
    if (k_scales is None) != (v_scales is None):
        raise ValueError(
            "k_scales and v_scales must be given together "
            f"(got k_scales={'set' if k_scales is not None else None}, "
            f"v_scales={'set' if v_scales is not None else None})"
        )
    if quantized:
        if k_scales.shape != (bh, s_kv) or v_scales.shape != (bh, s_kv):
            raise ValueError(
                f"scales must be (BH, S_kv)=({bh}, {s_kv}), got "
                f"{k_scales.shape} / {v_scales.shape}"
            )
        # 8-bit payload noise dwarfs bf16 matmul rounding, so the quantized
        # default is single-pass; explicit multi-pass requests are honored
        # (the fp32 Q stream still benefits).
        if precision in (None, "auto"):
            precision = "bf16"
    precision = resolve_precision(precision, q.dtype)

    if block_sizes is None:
        # GQA row folding: block_q must divide the per-group segment length.
        block_sizes = BlockSizes.fit(
            q_seq_len or s_q,
            s_kv,
            d,
            precision,
            causal,
            # Folded GQA rows multiply the per-head step count; only offer
            # head batching to plain (unfolded) layouts.
            n_heads=bh if q_seq_len is None else None,
        )
    bq, bkv = block_sizes.block_q, block_sizes.block_kv
    if s_q % bq or s_kv % bkv:
        raise ValueError(
            f"sequence lengths ({s_q}, {s_kv}) must be multiples of block sizes "
            f"({bq}, {bkv}); use ops.dispatch.attention for automatic padding"
        )

    num_q_blocks = s_q // bq
    num_kv_blocks = s_kv // bkv

    q_seq_blocks = resolve_q_seq_blocks(s_q, bq, q_seq_len)

    # Triangular causal grid (round 2): for plain self-attention causal runs
    # (static zero offset, no fold/ragged tail) the grid's pair dimension
    # enumerates only at/below-diagonal (q, kv) block pairs via prefetched
    # index tables — above-diagonal steps vanish instead of cycling through
    # the pipeline as predicated no-ops.
    tri = tri_ok and num_q_blocks > 1
    # Heads per grid step (round 3; VERDICT #4): off on the tri grid (long-S
    # causal — per-head grids are already deep) and when it doesn't divide.
    # The bm grid DOES batch heads (round 5): sparse masks make per-head
    # rows SHALLOW (a band mask runs 2-3 steps per q block), which is
    # exactly the pipeline-ramp regime head folding amortizes.
    block_h = 1 if tri else block_sizes.block_h
    if bh % block_h:
        raise ValueError(
            f"block_h ({block_h}) must divide batch*heads ({bh})"
        )
    if tri:
        # Sliding window (round 3): pairs fully before the window band are
        # excluded from the table too, so a windowed causal prefill does
        # O(S * window) grid steps instead of O(S^2) — the rect grid only
        # elided their DMAs, still paying the per-step pipeline cost.
        def _j_lo(i):
            if window is None:
                return 0
            return max(0, (i * bq - window + 1) // bkv)

        pairs = [
            (i, j)
            for i in range(num_q_blocks)
            for j in range(
                _j_lo(i), min(num_kv_blocks, ((i + 1) * bq - 1) // bkv + 1)
            )
        ]
        qi_tab = jnp.asarray([ij[0] for ij in pairs], jnp.int32)
        kj_tab = jnp.asarray([ij[1] for ij in pairs], jnp.int32)
        grid = (bh, len(pairs))
    elif bm:
        qi_tab = jnp.asarray(block_mask.qi, jnp.int32)
        kj_tab = jnp.asarray(block_mask.kj, jnp.int32)
        bm_first_tab = jnp.asarray(block_mask.first_kj, jnp.int32)
        bm_last_tab = jnp.asarray(block_mask.last_kj, jnp.int32)
        grid = (bh // block_h, block_mask.num_pairs)
    else:
        grid = (bh // block_h, num_q_blocks, num_kv_blocks)

    # Lane-packed fp32 emulation (see module docstring): for fp32 inputs at
    # d <= 64 the bf16_3x ladder upgrades to streaming [hi|lo] bf16 pairs
    # (same HBM bytes as fp32) contracted at full MXU width — fewer passes
    # AND better accuracy, so the upgrade is unconditional when eligible.
    packed = (
        precision == "bf16_3x"
        and not quantized
        and 2 * d <= NUM_LANES
        and q.dtype == k.dtype == v.dtype == jnp.float32
    )

    # MXU-computed l: extend V with a ones-column in an otherwise-idle output
    # lane (see module docstring).  Disabled for quantized KV (the folded
    # v_scales would pollute the ones-column sum) and for d >= 128 (no idle
    # lanes).  At d=128 an MXU-assisted row sum CANNOT win under the
    # measured cost model (scripts/probe_mxu.py: pass cost is OUTPUT-TILE-
    # bound): whether V extends to 256 lanes or l gets its own p @ ones
    # matmul, the added output occupies a full lane tile — ~PV-sized work,
    # +50% MXU time to remove a VPU reduce that is at most the current ~27%
    # gap.  The d=128 residual must come from VPU/MXU overlap (see
    # scripts/probe_d128.py pipeline_decomposition), not from moving the
    # sum onto the MXU.
    # Dropout additionally forces the VPU row sum: the ones-lane would sum
    # the DROPPED p tile, but l must be the undropped normalizer.
    lsum_mxu = (
        (not quantized) and (not packed) and d < NUM_LANES
        and dropout_rate is None
    )
    q_in, k_in = q, k
    qk_width = d
    if packed:
        q_in, k_in, v_in = _pack2(q), _pack2(k), _pack2(v)
        qk_width = 2 * d
        if 2 * d < NUM_LANES and dropout_rate is None:
            # Spare lane: MXU-computed row sum (ph + pl against ones).
            v_in = jnp.concatenate(
                [v_in, jnp.ones((bh, s_kv, 1), jnp.bfloat16)], axis=-1
            )
        v_width = v_in.shape[-1]
        acc_width = d
    elif lsum_mxu:
        pad = jnp.zeros((bh, s_kv, NUM_LANES - d), v.dtype)
        pad = pad.at[:, :, 0].set(jnp.ones((), v.dtype))
        v_in = jnp.concatenate([v, pad], axis=-1)
        v_width = NUM_LANES
        acc_width = NUM_LANES
    else:
        v_in = v
        v_width = d
        acc_width = d

    # Stateless one-shot path (round 3; VERDICT #1/#4): when every q row sees
    # exactly ONE KV block (e.g. the Llama-7B prefill shape S=2048 with
    # block_kv=2048, and every S<=2048 small shape), the online-softmax
    # recurrence is pure overhead — scratch init, (m, l) 128-lane broadcast
    # stores, alpha-rescale of a zero accumulator, and an epilogue read-back.
    # The kernel then computes softmax in registers and stores o directly.
    # Restricted to the statically-total case (no causal/window/kv_len): a
    # skipped step would otherwise leave o unwritten where the scratch path
    # writes zeros.
    one_shot = (
        not tri
        and not bm
        and not causal
        and window is None
        and kv_len is None
        and num_kv_blocks == 1
        and block_sizes.block_kv_compute == block_sizes.block_kv
    )

    kernel = functools.partial(
        _kernel,
        causal=causal,
        scale=scale,
        block_kv_compute=block_sizes.block_kv_compute,
        has_kv_len=kv_len is not None,
        num_kv_blocks=num_kv_blocks,
        save_residuals=save_residuals,
        quantized=quantized,
        lsum_mxu=lsum_mxu,
        head_dim=d,
        precision=precision,
        q_seq_blocks=q_seq_blocks,
        packed=packed,
        tri=tri,
        window=window,
        logit_softcap=logit_softcap,
        dropout_rate=dropout_rate,
        has_segments=has_segments,
        one_shot=one_shot,
        bm=bm,
        bm_mask_fn=block_mask.mask_fn if bm else None,
        bm_element_mask=bm and block_mask.needs_element_mask,
        pv_split=block_sizes.pv_split,
    )

    out_shape = [jax.ShapeDtypeStruct((bh, s_q, d), q.dtype)]  # o
    if tri:
        q_map = lambda b, p, sc, qi, kj: (b, qi[p], 0)
        kv_map = lambda b, p, sc, qi, kj: (b, kj[p], 0)
        kv_scale_map = lambda b, p, sc, qi, kj: (b, 0, kj[p])
    elif bm:
        q_map = lambda b, p, sc, qi, kj, fi, la: (b, qi[p], 0)
        kv_map = lambda b, p, sc, qi, kj, fi, la: (b, kj[p], 0)
        kv_scale_map = lambda b, p, sc, qi, kj, fi, la: (b, 0, kj[p])
    else:
        q_map = lambda b, i, j, qoff: (b, i, 0)
        if causal or kv_len is not None or window is not None:
            # KV blocks skipped by ``pl.when`` in the kernel (above the
            # diagonal, or past the traced kv_len) would still be DMA'd by
            # the BlockSpec pipeline.  Clamping the KV block index to the
            # last needed block repeats the previous index for skipped steps,
            # and Pallas elides the DMA for an unchanged block — the memory-
            # system analog of the reference's whole-block skip
            # (``src/flashattention.cu:434``).  The prefetched scalars
            # participate in the clamp, so the elision works at traced
            # offsets/lengths.
            def kv_block_index(i, j, qoff):
                last = num_kv_blocks - 1
                if causal:
                    if q_seq_blocks is not None:
                        i = jax.lax.rem(i, q_seq_blocks)
                    last = jnp.minimum(last, (qoff[0] + (i + 1) * bq - 1) // bkv)
                if kv_len is not None:
                    last = jnp.minimum(last, jnp.maximum((qoff[1] - 1) // bkv, 0))
                j = jnp.minimum(j, last)
                if window is not None:
                    # Lower-side clamp: blocks fully before the sliding
                    # window of the block's first row repeat the first needed
                    # index, so the pipeline elides their DMA too.
                    first = jnp.maximum(
                        0, (qoff[0] + i * bq - window + 1) // bkv
                    )
                    j = jnp.maximum(j, jnp.minimum(first, last))
                return j

        else:

            def kv_block_index(i, j, qoff):
                return j

        kv_map = lambda b, i, j, qoff: (b, kv_block_index(i, j, qoff), 0)
        kv_scale_map = lambda b, i, j, qoff: (b, 0, kv_block_index(i, j, qoff))

    out_specs = [pl.BlockSpec((block_h, bq, d), q_map)]
    if save_residuals:
        # l/m replicated over 128 lanes: a lane-aligned layout the epilogue can
        # store without a cross-lane transpose; sliced to (BH, S_q) below.
        out_shape += [
            jax.ShapeDtypeStruct((bh, s_q, NUM_LANES), jnp.float32),  # l
            jax.ShapeDtypeStruct((bh, s_q, NUM_LANES), jnp.float32),  # m
        ]
        out_specs += [
            pl.BlockSpec((block_h, bq, NUM_LANES), q_map),
            pl.BlockSpec((block_h, bq, NUM_LANES), q_map),
        ]

    in_specs = [
        pl.BlockSpec((block_h, bq, qk_width), q_map),  # q: kv-invariant per row
        pl.BlockSpec((block_h, bkv, qk_width), kv_map),
        pl.BlockSpec((block_h, bkv, v_width), kv_map),  # v (ext)
    ]
    inputs = [q_in, k_in, v_in]
    if quantized:
        # (BH, 1, S) layout: TPU block sublane dim must divide 8 or equal the
        # array dim, so a middle singleton axis carries the "row" of scales.
        in_specs += [
            pl.BlockSpec((block_h, 1, bkv), kv_scale_map),
            pl.BlockSpec((block_h, 1, bkv), kv_scale_map),
        ]
        inputs += [k_scales[:, None, :], v_scales[:, None, :]]
    if has_segments:
        # q ids as a (bq, 1) sublane column, kv ids as a (1, bkv) lane row:
        # the in-kernel same-segment compare is then a pure 2D broadcast.
        in_specs += [
            pl.BlockSpec((block_h, bq, 1), q_map),
            pl.BlockSpec((block_h, 1, bkv), kv_scale_map),
        ]
        inputs += [
            q_segment_ids[:, :, None].astype(jnp.int32),
            kv_segment_ids[:, None, :].astype(jnp.int32),
        ]

    if one_shot:
        scratch_shapes = []
    else:
        scratch_shapes = [pltpu.VMEM((block_h * bq, NUM_LANES), jnp.float32)]  # m
        if not lsum_mxu:
            scratch_shapes.append(
                pltpu.VMEM((block_h * bq, NUM_LANES), jnp.float32)
            )  # l
        scratch_shapes.append(
            pltpu.VMEM((block_h * bq, acc_width), jnp.float32)
        )  # acc

    # FLOPs: 2*S_q*S_kv*d for QK^T + 2*S_q*S_kv*d for PV, per batch*head.
    flops = 4 * bh * s_q * s_kv * d
    if causal:
        flops //= 2
    elif bm:
        flops = int(flops * block_mask.live_fraction)
    bytes_accessed = (
        q_in.size * q_in.dtype.itemsize
        + k_in.size * k_in.dtype.itemsize
        + v_in.size * v_in.dtype.itemsize
        + q.size * q.dtype.itemsize  # o
    )

    scalars = jnp.stack(
        [
            jnp.asarray(q_offset, jnp.int32),
            jnp.asarray(s_kv if kv_len is None else kv_len, jnp.int32),
            # Dropout seed rides the same prefetch vector (traced: a fresh
            # per-step seed never recompiles); ignored when dropout is off.
            jnp.asarray(dropout_seed, jnp.int32),
        ]
    )
    if tri:
        prefetch = (scalars, qi_tab, kj_tab)
    elif bm:
        prefetch = (scalars, qi_tab, kj_tab, bm_first_tab, bm_last_tab)
    else:
        prefetch = (scalars,)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # q_offset/kv_len scalars (+ the triangular pair tables when tri);
            # all traced — see docstring.
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
            if (tri or bm)
            # one_shot carries no cross-step state: every grid dim is free.
            else ("parallel", "parallel", "parallel" if one_shot else "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
            # valid large-block configs with an opaque compile error.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=bh * s_q * s_kv,
        ),
        interpret=interpret,
    )(*prefetch, *inputs)

    if save_residuals:
        o, l, m = outs
        return o, l[..., 0], m[..., 0]
    return outs[0]


def _naive_kernel(q_ref, k_ref, v_ref, o_ref, *, causal, scale, kv_len, q_offset):
    """Whole-row kernel: one Q block vs the full KV sequence, dense softmax.

    The TPU analog of the reference's naive tiled kernel ``flash_tiled``
    (``src/flashattention.cu:26-136``): simple, obviously-correct, used to
    cross-check the tuned kernel (SURVEY.md 2.1).  Materializes a
    (block_q, S_kv) score stripe in VMEM, so only valid for moderate S_kv.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if scale != 1.0:
        s = s * scale
    mask = None
    if causal:
        q_idx = pl.program_id(1)
        block_q = q_ref.shape[1]
        row_ids = q_offset + q_idx * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = col_ids <= row_ids
    if kv_len is not None and kv_len < s.shape[1]:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        len_mask = col_ids < kv_len
        mask = len_mask if mask is None else (mask & len_mask)
    if mask is not None:
        s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    o = jax.lax.dot(
        p, v, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "kv_len", "q_offset", "interpret"),
)
def flash_attention_naive(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: float = 1.0,
    block_q: int = 128,
    kv_len: int | None = None,
    q_offset: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Naive Pallas attention (full-KV stripe per Q block); see _naive_kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, s_q, d = q.shape
    _, s_kv, _ = k.shape
    if s_q % block_q:
        raise ValueError(f"s_q ({s_q}) must be a multiple of block_q ({block_q})")

    kernel = functools.partial(
        _naive_kernel, causal=causal, scale=scale, kv_len=kv_len, q_offset=q_offset
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, s_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_kv, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_kv, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
