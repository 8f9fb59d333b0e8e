"""End-to-end codec pipeline: 4-file bitstream, encode/decode drivers.

Preserves the reference bitstream semantics exactly (coder.py:16-112):

  <name><postfix>_C.bin           lossless bottleneck coordinates (built-in
                                  octree codec, or tmc3 when available)
  <name><postfix>_F.bin           rANS-coded bottleneck features
  <name><postfix>_H.bin           header: shape int32x2, len int8,
                                  min/max float32 (ref coder.py:51-55)
  <name><postfix>_num_points.bin  3x int32 per-scale ground-truth counts

plus the same knobs: `rho` multiplies only the final-scale top-k count
(ref coder.py:107), `scaling_factor` pre-scaling happens in the CLI layer.

Canonical order contract (ref coder.py:84,98-99): bottleneck rows are sorted
by (x, y, z) lexicographic order on BOTH sides before features are attached —
the encoder sorts the extracted rows before rANS coding, and the decoder
re-sorts whatever the coordinate codec returns (the built-in octree codec
emits Morton order; tmc3 has its own) into the identical order.

Overflow safety: every jitted stage returns the BlockGrid `dropped` counter
and the codec refuses to emit or accept a stream that lost voxels to a
too-small capacity plan (ME never drops voxels; neither may we).

TPU structure: the analysis/synthesis transforms are jitted per
capacity-bucket (static shapes); the host only does file I/O, CDF
quantization and the byte-level entropy coding.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcgcv2_tpu.codec import gpcc, native, octree
from pcgcv2_tpu.config import BlockPlan, ModelConfig
from pcgcv2_tpu.data import io as pcio
from pcgcv2_tpu.data.voxelize import unique_rows
from pcgcv2_tpu.models.entropy import pmf_host
from pcgcv2_tpu.models.pcc import PCCModel
from pcgcv2_tpu.ops import blocks as B


def _bucket(n: int, granularity: int) -> int:
    return max(granularity, -(-n // granularity) * granularity)


def canonical_order(coords: np.ndarray) -> np.ndarray:
    """Row permutation sorting [N, 3] coords ascending by (x, y, z) — the
    shared encoder/decoder feature order (ref coder.py:84,98-99 uses the
    same raveled-key sort)."""
    return np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))


def block_counts(coords: np.ndarray) -> Tuple[int, int, int, int]:
    """Occupied-block counts at strides (1, 2, 4, 8) — the measured frame
    footprint that BlockPlan.for_frame turns into exact-fit capacities.

    This sits in the per-frame encode path.  When the block grid is small
    enough (res <= 4096: 256^3 bool = 17 MB), counting goes through a dense
    occupancy scatter + reshape-any pyramid — O(n) with no sort, ~5x faster
    than the int64 np.unique at vox10 (55 -> ~11 ms measured).  Larger
    grids fall back to one full-length key dedup, with the three coarser
    counts from the unique fine coords ((c >> (4+s)) == ((c >> 4) >> s))."""
    shift = int(B.BS).bit_length() - 1  # log2(block side)
    c = np.asarray(coords, dtype=np.int64) >> shift
    if len(c) == 0:
        return (0, 0, 0, 0)
    g = int(c.max()) + 1
    g8 = -(-g // 8) * 8
    if g8 <= 256:
        occ = np.zeros((g8, g8, g8), dtype=bool)
        occ[c[:, 0], c[:, 1], c[:, 2]] = True
        counts = [int(np.count_nonzero(occ))]
        for _ in range(3):
            h = occ.shape[0] // 2
            occ = occ.reshape(h, 2, h, 2, h, 2).any(axis=(1, 3, 5))
            counts.append(int(np.count_nonzero(occ)))
        return tuple(counts)
    key = (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]
    fine = np.unique(key)
    counts = [len(fine)]
    x, y, z = fine >> 42, (fine >> 21) & 0x1FFFFF, fine & 0x1FFFFF
    for s in range(1, 4):
        ks = ((x >> s) << 42) | ((y >> s) << 21) | (z >> s)
        counts.append(len(np.unique(ks)))
    return tuple(counts)


class FeatureCoder:
    """Learned-prior rANS coding of bottleneck features
    (replaces torchac usage at ref entropy_model.py:151-195)."""

    def __init__(self, filename: str, pmf_fn):
        self.filename = filename
        self._pmf_fn = pmf_fn  # (min_v scalar, num_symbols static) -> [C, S]

    def encode(self, feats: np.ndarray, postfix: str = "") -> None:
        vals = np.round(np.asarray(feats, dtype=np.float64)).astype(np.int32)
        min_v = int(vals.min())
        max_v = int(vals.max())
        s = max_v - min_v + 1
        pmf = np.asarray(self._pmf_fn(min_v, s))
        cdf = native.quantize_cdf(pmf)
        syms = (vals - min_v).reshape(-1)
        blob = native.rans_encode(cdf, syms)
        with open(self.filename + postfix + "_F.bin", "wb") as f:
            f.write(blob)
        with open(self.filename + postfix + "_H.bin", "wb") as f:
            f.write(np.array(vals.shape, dtype=np.int32).tobytes())
            f.write(np.array(1, dtype=np.int8).tobytes())
            f.write(np.array([min_v], dtype=np.float32).tobytes())
            f.write(np.array([max_v], dtype=np.float32).tobytes())

    def decode(self, postfix: str = "") -> np.ndarray:
        with open(self.filename + postfix + "_H.bin", "rb") as f:
            shape = np.frombuffer(f.read(8), dtype=np.int32)
            n_minv = int(np.frombuffer(f.read(1), dtype=np.int8)[0])
            min_v = int(np.frombuffer(f.read(4 * n_minv), dtype=np.float32)[0])
            max_v = int(np.frombuffer(f.read(4 * n_minv), dtype=np.float32)[0])
        with open(self.filename + postfix + "_F.bin", "rb") as f:
            blob = f.read()
        s = max_v - min_v + 1
        pmf = np.asarray(self._pmf_fn(min_v, s))
        cdf = native.quantize_cdf(pmf)
        syms = native.rans_decode(cdf, blob, int(shape[0]) * int(shape[1]))
        vals = syms.reshape(int(shape[0]), int(shape[1])) + min_v
        return vals.astype(np.float32)


class CoordinateCoder:
    """Lossless coding of stride-normalized bottleneck coordinates
    (ref coder.py:16-36).  Uses tmc3 when present, else the built-in
    octree codec — streams are tagged so decode auto-dispatches."""

    def __init__(self, filename: str, prefer_gpcc: bool = False):
        self.filename = filename
        self.use_gpcc = prefer_gpcc and gpcc.find_tmc3() is not None

    def encode(self, coords: np.ndarray, postfix: str = "") -> None:
        path = self.filename + postfix + "_C.bin"
        if self.use_gpcc:
            ply = path + ".tmp.ply"
            pcio.write_ply_ascii_geo(ply, coords)
            gpcc.gpcc_encode(ply, path)
            os.remove(ply)
        else:
            with open(path, "wb") as f:
                f.write(octree.encode(coords))

    def decode(self, postfix: str = "") -> np.ndarray:
        path = self.filename + postfix + "_C.bin"
        with open(path, "rb") as f:
            head = f.read(4)
        if head in (octree.MAGIC, octree.MAGIC2, octree.MAGIC3):
            with open(path, "rb") as f:
                return octree.decode(f.read())
        ply = path + ".tmp.ply"
        gpcc.gpcc_decode(path, ply)
        coords = pcio.read_ply_geo(ply)
        os.remove(ply)
        return coords


class Coder:
    """Single-frame encode/decode orchestrator (ref Coder, coder.py:73-112).

    res: coordinate-space bound of the frames this coder handles (vox10 ->
    1024); capacity plans and jit caches are keyed per (res, size bucket).
    """

    def __init__(
        self,
        params,
        filename: str,
        res: int = 1024,
        model_config: ModelConfig = ModelConfig(),
        input_granularity: int = 65536,
        prune_granularity: int = 16384,
        prefer_gpcc: bool = False,
        up_factors=None,
        dec_nb=None,
        streamed_slabs: int = 0,
    ):
        """up_factors / dec_nb override BlockPlan.for_cloud's decode-side
        capacity heuristics (surface-density assumptions): content denser
        than typical raises a capacity-overflow RuntimeError, and these
        knobs let callers resize without editing the library.

        streamed_slabs > 0 decodes the final stage in that many x-slabs
        (bounded memory — whole-frame vox11+); 0 picks automatically
        (streamed at res >= 2048, monolithic below)."""
        self.params = params  # property: device-resident + host EB twin
        self.filename = filename
        self.res = res
        self.model_config = model_config
        self.input_granularity = input_granularity
        self.prune_granularity = prune_granularity
        self.up_factors = tuple(up_factors) if up_factors else None
        self.dec_nb = tuple(dec_nb) if dec_nb else None
        self.streamed_slabs = streamed_slabs
        self.coordinate_coder = CoordinateCoder(filename, prefer_gpcc)
        self.feature_coder = FeatureCoder(filename, self._pmf)
        self._models = {}

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        """Checkpoints load as host numpy trees (trainer.load_params); jit
        arguments that are numpy re-transfer EVERY call — dozens of small
        leaves x fixed tunnel latency each, per encode AND per decode.
        Device-put once here (no-op for already-device trees).  The
        entropy-bottleneck leaves keep a HOST copy: pmf_host runs float64
        numpy math per encode/decode, and reading device leaves back would
        pay D2H round-trips instead."""
        self._eb_host = jax.tree_util.tree_map(
            np.asarray, p["params"]["entropy_bottleneck"]
        )
        self._params = jax.device_put(p)

    # --- jit-cached model/stage builders -----------------------------------

    @staticmethod
    def _log_new_fn(kind: str, plan: BlockPlan, **caps) -> None:
        """Surface jit-cache misses: on multi-frame workloads with drifting
        footprints, every distinct (plan, cap) key is a fresh XLA compile —
        minutes over a cold tunnel — so the event must be visible rather
        than silently folded into a frame's wall-clock."""
        import logging

        logging.getLogger(__name__).info(
            "building %s jit for plan nb=%s res=%d %s (new compile unless "
            "the persistent cache hits; bucket sizes via "
            "input_granularity/prune_granularity)",
            kind, plan.nb, plan.res,
            " ".join(f"{k}={v}" for k, v in caps.items()),
        )

    def _model(self, plan: BlockPlan) -> PCCModel:
        if plan not in self._models:
            self._models[plan] = PCCModel(
                config=self.model_config, plan=plan, num_batches=1
            )
        return self._models[plan]

    # Un-chunked conv3 budget for codec traces.  MEASURED SLOWER on the
    # real chip (scripts/ab_conv_r5.py: direct 81 ms vs chunk512 59 ms at
    # the vox10 stage-2 shape — the monolithic gather+concat graph beats
    # the lax.map loop on op count but loses on fusion quality), so it
    # stays 0 (chunked path everywhere).  Kept as a knob for future
    # backends where loop overhead dominates.
    DIRECT_HALO_BYTES = 0

    @functools.lru_cache(maxsize=None)
    def _encode_fn(self, plan: BlockPlan, cap: int, y_cap: int):
        """Packed-transfer analysis transform.

        The TPU sits behind a high-latency tunnel here: every host->device
        transfer pays a large fixed cost and limited bandwidth (~60 MB/s
        H2D measured), so the jit takes ONE packed coordinate array —
        Morton-style uint32 [cap] ((x<<20)|(y<<10)|z) at res <= 1024,
        uint16 [cap, 3] xyz rows above (res <= 4096 < 2^16 by contract) —
        plus a tiny int32 row count, and returns ONE packed f32 array:
        [y_cap + 1, 3+C] bottleneck ds-coords + features (canonically
        sorted on device) with a trailing metadata row (ny, dropped,
        n_unique, 3 GT counts — f32 holds counts exactly up to 2^24).
        One array each way = one transfer round-trip each way.  Input may
        contain duplicate rows (identical all-ones payloads): blockify's
        slot scatter dedups them; GT counts use the deduped voxel counts.
        """
        model = self._model(plan)
        res_y = max(1, plan.res // 8)
        morton = plan.res <= 1024
        self._log_new_fn("encode", plan, cap=cap, y_cap=y_cap)

        @jax.jit
        def fn(params, pack, n_arr):
            n = n_arr[0]
            valid = jnp.arange(cap, dtype=jnp.int32) < n
            if morton:
                p = pack.astype(jnp.uint32)
                xyz = jnp.stack(
                    [(p >> 20) & 1023, (p >> 10) & 1023, p & 1023],
                    axis=1,
                ).astype(jnp.int32)
            else:
                xyz = pack.astype(jnp.int32)
            rows = jnp.concatenate(
                [jnp.zeros((cap, 1), jnp.int32), xyz], axis=1
            )
            with B.conv3_direct_bytes(Coder.DIRECT_HALO_BYTES):
                y, nums, n_unique = model.apply(
                    params, rows, valid, method=PCCModel.encode_fn
                )
            yc, yf, ny = B.extract(y, y_cap)
            ds = yc[:, 1:] // 8
            # canonical order (module docstring): ascending (x, y, z)
            key = (ds[:, 0] * res_y + ds[:, 1]) * res_y + ds[:, 2]
            vy = jnp.arange(y_cap, dtype=jnp.int32) < ny
            order = jnp.argsort(
                jnp.where(vy, key, jnp.iinfo(jnp.int32).max)
            )
            packed = jnp.concatenate(
                [ds.astype(jnp.float32), yf.astype(jnp.float32)], axis=1
            )[order]
            meta = jnp.stack(
                [ny, y.dropped, n_unique, nums[0][0], nums[1][0],
                 nums[2][0]]
            ).astype(jnp.float32)
            meta_row = jnp.zeros((1, packed.shape[1]), jnp.float32)
            meta_row = meta_row.at[0, :6].set(meta)
            return jnp.concatenate([packed, meta_row], axis=0)

        return fn

    @staticmethod
    def _pack_input(coords: np.ndarray, cap: int, res: int) -> np.ndarray:
        """Host twin of _encode_fn's input spec (see its docstring)."""
        n = len(coords)
        if res <= 1024:
            c = np.asarray(coords, np.int64)
            key = ((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2])
            pack = np.zeros((cap,), dtype=np.uint32)
            pack[:n] = key.astype(np.uint32)
        else:
            pack = np.zeros((cap, 3), dtype=np.uint16)
            pack[:n] = coords
        return pack

    @staticmethod
    def _pack_bottleneck(coords: np.ndarray, feats: np.ndarray,
                         meta_vals, cap_y: int) -> np.ndarray:
        """Host side of the decode-input transfer: ONE int16 array
        [cap_y + 2, 3 + C] — stride-normalized xyz (< res/8 <= 512) +
        integer feature symbols per row, metadata (m, nums0..2: values up
        to ~20M) split across two trailing low16/high16 rows.  int16
        halves the H2D bytes vs the round-4 f32 pack."""
        m = len(coords)
        pack = np.zeros((cap_y + 2, 3 + feats.shape[1]), dtype=np.int16)
        pack[:m, :3] = coords
        pack[:m, 3:] = feats  # exact: rANS symbols are small ints
        v = np.zeros(pack.shape[1], dtype=np.int64)
        v[: len(meta_vals)] = meta_vals
        pack[cap_y] = (v & 0xFFFF).astype(np.uint16).view(np.int16)
        pack[cap_y + 1] = ((v >> 16) & 0xFFFF).astype(np.uint16).view(
            np.int16)
        return pack

    @staticmethod
    def _unpack_bottleneck(pack, cap_y: int, nb3: int, res_y: int):
        """Shared decode-side unpacking: ONE int16 array [cap_y+2, 3+C]
        (see _pack_bottleneck) -> (bottleneck BlockGrid, nums int32 [3]).
        See _encode_fn for why transfers are packed."""
        lo = pack[cap_y].astype(jnp.int32) & 0xFFFF
        hi = pack[cap_y + 1].astype(jnp.int32) & 0xFFFF
        vals = (hi << 16) | lo
        m = vals[0]
        nums = vals[1:4]
        xyz = pack[:cap_y, :3].astype(jnp.int32) * 8
        # Decoder grids are the HBM peak (pre-prune candidate grids at
        # full res); storing their features in the compute dtype halves
        # that peak (17.6 GB -> fits, measured at vox10).  Occupancy
        # decisions (top-k, masks) are bool/int and unaffected.
        feats = pack[:cap_y, 3:].astype(B.COMPUTE_DTYPE)
        valid = jnp.arange(cap_y, dtype=jnp.int32) < m
        rows = jnp.concatenate(
            [jnp.zeros((cap_y, 1), jnp.int32), xyz], axis=1
        )
        y = B.blockify(
            rows, feats, valid, nb3, stride=8, res=res_y, num_batches=1
        )
        return y, nums

    @functools.lru_cache(maxsize=None)
    def _decode_fn(self, plan: BlockPlan, cap_y: int):
        model = self._model(plan)
        nb3 = plan.nb[3]
        # The bottleneck grid lives at stride 8: its grid resolution is
        # plan.res // 8 (the encoder's three conv_down halvings), NOT
        # plan.res — the full-res value would allocate an 8x-per-axis
        # (512x cells) lookup table and the three conv_up doublings would
        # then blow past MAX_TABLE_CELLS at vox10.
        res_y = max(1, plan.res // 8)
        self._log_new_fn("decode", plan, cap_y=cap_y)

        @jax.jit
        def fn(params, pack):
            y, nums = Coder._unpack_bottleneck(pack, cap_y, nb3, res_y)
            nums_list = [nums[0:1], nums[1:2], nums[2:3]]
            with B.conv3_direct_bytes(Coder.DIRECT_HALO_BYTES):
                out = model.apply(
                    params, y, nums_list, method=PCCModel.decode_fn
                )
            # Host-side extraction: ship block coords + bit-packed slot
            # occupancy (2.9 MB at vox10) instead of running the 23M-row
            # extract scatter on device (~107 ms — round-5 trace).
            return Coder._merge_decode_out(out, out.dropped)

        return fn

    @staticmethod
    def _merge_decode_out(out, dropped):
        """ONE int32 output array [nb+1, VOL//32 + 3]: bit-packed slot
        occupancy as little-endian words, block xyz coords, and a trailing
        metadata row (voxel count, dropped) — one D2H round-trip instead
        of three (each fetch over the tunnel pays a fixed latency)."""
        bc, bits = B.pack_occupancy(out)
        b = bits.reshape(out.nb_cap, B.VOL // 32, 4).astype(jnp.int32)
        words = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
                 | (b[..., 3] << 24))
        arr = jnp.concatenate([words, bc.astype(jnp.int32)], axis=1)
        meta_row = jnp.zeros((1, arr.shape[1]), jnp.int32)
        meta_row = meta_row.at[0, 0].set(out.voxel_count())
        meta_row = meta_row.at[0, 1].set(dropped)
        return jnp.concatenate([arr, meta_row], axis=0)

    @staticmethod
    def _split_decode_out(a: np.ndarray):
        """(meta [count, dropped], block coords int32 [nb, 3], slot bits
        uint8 [nb, VOL//8]) from _merge_decode_out's array (host side)."""
        w = a.shape[1] - 3
        meta = a[-1, :2]
        bc = a[:-1, w:]
        bits = np.ascontiguousarray(a[:-1, :w]).view(np.uint8)
        return meta, bc, bits

    @functools.lru_cache(maxsize=None)
    def _decode_streamed_fn(self, plan: BlockPlan, n_slabs: int,
                            cap_y: int):
        """Memory-bounded decode: stages 0-1 whole, final stage streamed
        over x-slabs of blocks (1-block halo; the stage's receptive field
        is 8 voxels).  Candidate FEATURES exist only per-slab; globally only
        the 1-channel cls logits + candidate structure are materialized —
        what makes whole-frame vox11 (res 2048) decode fit one chip.
        """
        model = self._model(plan)
        nb3 = plan.nb[3]
        res_y = max(1, plan.res // 8)
        cand_cap = plan.up_cap(2)
        # Per-slab caps.  Slab boundaries are EQUAL-COUNT quantiles of the
        # sorted block x-coords (blocks are sorted by (b, bx, by, bz), so
        # the valid prefix's bx is nondecreasing and boundary ranks index
        # it directly) — the round-4 equal-x-RANGE slabs needed 4x-mean
        # caps against density imbalance, which made the 8-slab vox12
        # decode do ~4x the monolithic conv work (7.86 s vs the reference
        # 2.3 s).  Quantile slabs are count-balanced up to plane
        # granularity, so 2x mean (halo planes + candidate drift) is
        # enough; overflow is detected (dropped counter) and retried on
        # the density-prior tier.  Floors scale with the plan.
        sub_in_cap = max(32, plan.dec_nb[1] * 2 // n_slabs)
        sub_cand_cap = max(256, plan.up_cap(2) * 2 // n_slabs)
        self._log_new_fn("streamed-decode", plan, cap_y=cap_y,
                         n_slabs=n_slabs)

        @jax.jit
        def fn(params, pack):
            y, nums = Coder._unpack_bottleneck(pack, cap_y, nb3, res_y)
            with B.conv3_direct_bytes(Coder.DIRECT_HALO_BYTES):
                out = model.apply(
                    params, y, [nums[0:1], nums[1:2]],
                    method=PCCModel.decode_coarse_fn,
                )
            cand = B.conv_up_structure(out, cand_cap)
            g_in = B.grid_dim(out.res)
            logits0 = jnp.zeros((cand_cap, B.VOL), jnp.float32)

            # equal-count slab boundaries: bounds[i] = bx at rank
            # i * count / n_slabs; slab i owns bx in [bounds[i],
            # bounds[i+1]) — disjoint, covering, count-balanced
            bx = out.coords[:, 1]
            ranks = (
                jnp.arange(1, n_slabs, dtype=jnp.int32) * out.count
                // n_slabs
            )
            bounds = jnp.concatenate([
                jnp.zeros((1,), jnp.int32),
                bx[jnp.clip(ranks, 0, out.nb_cap - 1)],
                jnp.full((1,), g_in, jnp.int32),
            ])

            def body(i, carry):
                logits, extra_drops = carry
                ia = bounds[i]
                ib = bounds[i + 1]
                keep_blocks = (bx >= ia - 1) & (bx < ib + 1)
                sub = B.compact_where(out, keep_blocks, sub_in_cap)
                sub_cls = model.apply(
                    params, sub, sub_cand_cap,
                    method=PCCModel.decode_stage2_fn,
                )
                cx = sub_cls.coords[:, 1]
                interior = (
                    (cx >= 2 * ia) & (cx < 2 * ib) & sub_cls.valid
                )
                key = B._flat_block_key(
                    sub_cls.coords, cand.G, cand.num_batches
                )
                grow = jnp.where(
                    interior, cand.table[key],
                    cand_cap + jnp.arange(
                        sub_cls.nb_cap, dtype=jnp.int32
                    ),
                )
                logits = logits.at[grow].set(
                    sub_cls.feats[:, :, 0].astype(jnp.float32),
                    mode="drop", unique_indices=True,
                )
                extra_drops = extra_drops + (sub_cls.dropped - out.dropped)
                return logits, extra_drops

            logits, extra_drops = jax.lax.fori_loop(
                0, n_slabs, body, (logits0, jnp.int32(0))
            )
            keep = B.topk_mask(cand, logits, nums[2:3])
            pruned = B.prune(cand, keep)
            return Coder._merge_decode_out(
                pruned, cand.dropped + extra_drops
            )

        return fn

    def _pmf(self, min_v, num_symbols: int):
        """Host PMF evaluation (models/entropy.py:pmf_host): the grid is a
        [S, 8] batch through a width-3 MLP — running it on device costs a
        full tunnel round-trip per encode and per decode for microseconds
        of math."""
        return pmf_host(self._eb_host, float(min_v), num_symbols)

    def _apply_overrides(self, plan: BlockPlan) -> BlockPlan:
        import dataclasses

        if self.up_factors is not None:
            # explicit factors take over: drop the absolute candidate caps
            # so factor * coarser-cap sizing applies again
            plan = dataclasses.replace(
                plan, up_factors=self.up_factors, up_caps=()
            )
        if self.dec_nb is not None:
            plan = dataclasses.replace(plan, dec_nb=self.dec_nb)
        return plan

    def _plan_for(self, n_points: int) -> BlockPlan:
        """Density-prior plan (conservative; the pre-round-4 default and
        the decode retry tier when exact-fit caps overflow)."""
        cap = _bucket(n_points, self.input_granularity)
        return self._apply_overrides(BlockPlan.for_cloud(cap, self.res))

    def _plan_from_counts(self, counts) -> BlockPlan:
        """Exact-fit plan from measured per-scale block counts (see
        BlockPlan.for_frame) — ~1.7-2.5x less conv work than _plan_for."""
        return self._apply_overrides(
            BlockPlan.for_frame(self.res, tuple(counts))
        )

    # --- public API ---------------------------------------------------------

    def encode(self, coords: np.ndarray, postfix: str = ""):
        """coords: [N, 3] int voxel coordinates of one frame.

        Returns (bottleneck coords [ny, 3] stride-normalized, features
        [ny, C]) in canonical order — the exact rows the decoder must
        reproduce (for round-trip tests).
        """
        coords = unique_rows(coords)  # canonical sorted-unique input rows
        n = len(coords)
        counts = block_counts(coords)
        plan = self._plan_from_counts(counts)
        cap = _bucket(n, self.input_granularity)
        pack = Coder._pack_input(coords, cap, plan.res)
        n_arr = np.array([n], dtype=np.int32)
        # Bottleneck voxel count is ~n/50 on surface content (3 halvings of
        # a 2-D surface); n/16 is a comfortable cap, with a one-time re-jit
        # fallback at full cap if a pathological frame overflows it.
        y_cap = _bucket(max(n // 16, 1), self.prune_granularity)
        out = np.asarray(self._encode_fn(plan, cap, y_cap)(
            self.params, pack, n_arr
        ))
        packed, meta = out[:-1], out[-1, :6]
        if int(meta[0]) >= y_cap:
            y_cap = cap
            out = np.asarray(self._encode_fn(plan, cap, y_cap)(
                self.params, pack, n_arr
            ))
            packed, meta = out[:-1], out[-1, :6]
        ny, n_drop, n_in = int(meta[0]), int(meta[1]), int(meta[2])
        if n_drop or n_in != n or ny >= y_cap:
            raise RuntimeError(
                f"capacity plan too small for frame ({n} pts, res "
                f"{self.res}): dropped={n_drop} n_in={n_in} "
                f"ny={ny}; raise BlockPlan.for_cloud sizing"
            )
        num_points = [int(v) for v in meta[3:6]]
        with open(self.filename + postfix + "_num_points.bin", "wb") as f:
            # 3 per-scale GT voxel counts (reference semantics,
            # ref coder.py:86-90) + 4 per-scale occupied-block counts:
            # the measured footprint that lets the DECODER plan exact-fit
            # capacities too (BlockPlan.for_frame).  Decoders accept the
            # legacy 12-byte form (density-prior plan).
            f.write(np.array(num_points, dtype=np.int32).tobytes())
            f.write(np.array(counts, dtype=np.int32).tobytes())

        packed = packed[:ny]
        ds_coords = packed[:, :3].astype(np.int32)
        feats = packed[:, 3:]
        self.feature_coder.encode(feats, postfix)
        self.coordinate_coder.encode(ds_coords, postfix)
        return ds_coords, np.round(feats)

    def decode(self, rho: float = 1.0, postfix: str = "") -> np.ndarray:
        coords = self.coordinate_coder.decode(postfix)
        # canonical order contract with the encoder (see module docstring)
        coords = coords[canonical_order(coords)]
        feats = self.feature_coder.decode(postfix)
        m = len(coords)
        assert feats.shape[0] == m, "feature/coordinate count mismatch"

        with open(self.filename + postfix + "_num_points.bin", "rb") as f:
            head = np.frombuffer(f.read(28), dtype=np.int32)
        num_points = head[:3].tolist()
        n_frame = num_points[-1]
        num_points[-1] = int(rho * num_points[-1])  # ref coder.py:107

        # Plan ladder: exact-fit caps from the header's measured block
        # counts when present (round-4 streams), then the conservative
        # density-prior plan as the overflow retry tier / legacy fallback.
        plans = []
        if head.size == 7:
            p = self._plan_from_counts(head[3:7])
            if rho > 1.0:
                # rho densifies only the final-scale top-k (ref
                # coder.py:107): kept voxels can light more blocks than
                # the measured footprint, but never more than the
                # candidate grid holds — raise the final post-prune cap
                # to the candidate cap instead of burning a wasted full
                # decode + recompile on the density-prior retry tier.
                import dataclasses

                p = dataclasses.replace(
                    p, dec_nb=(p.dec_nb[0], p.dec_nb[1], p.up_cap(2))
                )
            plans.append(p)
        plans.append(self._plan_for(max(n_frame, num_points[-1])))

        cap_y = _bucket(m, self.prune_granularity)
        pack = Coder._pack_bottleneck(
            coords, feats, [m] + list(num_points), cap_y
        )
        for tier, plan in enumerate(plans):
            n_slabs = self.streamed_slabs or (8 if plan.res >= 2048 else 0)
            if n_slabs:
                decode_fn = self._decode_streamed_fn(plan, n_slabs, cap_y)
            else:
                decode_fn = self._decode_fn(plan, cap_y)
            meta, bc, bits = Coder._split_decode_out(
                np.asarray(decode_fn(self.params, pack))
            )
            if not int(meta[1]):
                break
            if tier + 1 == len(plans):
                raise RuntimeError(
                    f"decode overflowed the capacity plan "
                    f"(dropped={int(meta[1])}); raise BlockPlan.for_cloud "
                    f"sizing"
                )
            import logging

            logging.getLogger(__name__).warning(
                "exact-fit decode caps overflowed (dropped=%d); retrying "
                "on the density-prior plan", int(meta[1]),
            )
        n_out = int(meta[0])
        out = B.host_extract(bc, bits)
        assert len(out) == n_out, "host extraction count mismatch"
        return out

    def bitstream_bytes(self, postfix: str = "") -> dict:
        """Sizes of the 4 bitstream files (ref test.py:63-66)."""
        return {
            ext: os.path.getsize(self.filename + postfix + ext)
            for ext in ("_C.bin", "_F.bin", "_H.bin", "_num_points.bin")
        }
