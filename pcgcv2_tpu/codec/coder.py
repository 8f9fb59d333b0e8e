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
from pcgcv2_tpu.data.voxelize import collate
from pcgcv2_tpu.models.entropy import EntropyBottleneck
from pcgcv2_tpu.models.pcc import PCCModel
from pcgcv2_tpu.ops import blocks as B


def _bucket(n: int, granularity: int) -> int:
    return max(granularity, -(-n // granularity) * granularity)


def canonical_order(coords: np.ndarray) -> np.ndarray:
    """Row permutation sorting [N, 3] coords ascending by (x, y, z) — the
    shared encoder/decoder feature order (ref coder.py:84,98-99 uses the
    same raveled-key sort)."""
    return np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))


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
        pmf = np.asarray(self._pmf_fn(jnp.float32(min_v), s))
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
        pmf = np.asarray(self._pmf_fn(jnp.float32(min_v), s))
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
        if head == octree.MAGIC:
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
    ):
        self.params = params
        self.filename = filename
        self.res = res
        self.model_config = model_config
        self.input_granularity = input_granularity
        self.prune_granularity = prune_granularity
        self.coordinate_coder = CoordinateCoder(filename, prefer_gpcc)
        self.feature_coder = FeatureCoder(filename, self._pmf)
        self._models = {}
        self._eb = EntropyBottleneck(
            channels=model_config.enc_channels[-1],
            filters=model_config.entropy_filters,
            init_scale=model_config.entropy_init_scale,
        )

    # --- jit-cached model/stage builders -----------------------------------

    def _model(self, plan: BlockPlan) -> PCCModel:
        if plan not in self._models:
            self._models[plan] = PCCModel(
                config=self.model_config, plan=plan, num_batches=1
            )
        return self._models[plan]

    @functools.lru_cache(maxsize=None)
    def _encode_fn(self, plan: BlockPlan, ext_cap: int):
        model = self._model(plan)

        @jax.jit
        def fn(params, coords, valid):
            y, nums, n_in = model.apply(
                params, coords, valid, method=PCCModel.encode_fn
            )
            yc, yf, ny = B.extract(y, ext_cap)
            return yc, yf, ny, jnp.concatenate(nums), n_in, y.dropped

        return fn

    @functools.lru_cache(maxsize=None)
    def _decode_fn(self, plan: BlockPlan, out_cap: int):
        model = self._model(plan)
        nb3 = plan.nb[3]
        # The bottleneck grid lives at stride 8: its grid resolution is
        # plan.res // 8 (the encoder's three conv_down halvings), NOT
        # plan.res — the full-res value would allocate an 8x-per-axis
        # (512x cells) lookup table and the three conv_up doublings would
        # then blow past MAX_TABLE_CELLS at vox10.
        res_y = max(1, plan.res // 8)

        @jax.jit
        def fn(params, rows, feats, valid, nums):
            # Decoder grids are the HBM peak (pre-prune candidate grids at
            # full res); storing their features in the compute dtype halves
            # that peak (17.6 GB -> fits, measured at vox10).  Occupancy
            # decisions (top-k, masks) are bool/int and unaffected.
            feats = feats.astype(B.COMPUTE_DTYPE)
            y = B.blockify(
                rows, feats, valid, nb3, stride=8, res=res_y, num_batches=1
            )
            nums_list = [nums[0:1], nums[1:2], nums[2:3]]
            out = model.apply(
                params, y, nums_list, method=PCCModel.decode_fn
            )
            oc, _, cnt = B.extract(out, out_cap, with_feats=False)
            return oc, cnt, out.dropped

        return fn

    @functools.lru_cache(maxsize=None)
    def _pmf_jit(self, num_symbols: int):
        eb = self._eb

        @jax.jit
        def fn(params, min_v):
            return eb.apply(
                params, min_v, num_symbols - 1, method=EntropyBottleneck.pmf
            )

        return fn

    def _pmf(self, min_v, num_symbols: int):
        eb_params = {"params": self.params["params"]["entropy_bottleneck"]}
        return self._pmf_jit(num_symbols)(eb_params, min_v)

    def _plan_for(self, n_points: int) -> BlockPlan:
        cap = _bucket(n_points, self.input_granularity)
        return BlockPlan.for_cloud(cap, self.res)

    # --- public API ---------------------------------------------------------

    def encode(self, coords: np.ndarray, postfix: str = ""):
        """coords: [N, 3] int voxel coordinates of one frame.

        Returns (bottleneck coords [ny, 3] stride-normalized, features
        [ny, C]) in canonical order — the exact rows the decoder must
        reproduce (for round-trip tests).
        """
        coords = np.unique(np.asarray(coords, dtype=np.int32), axis=0)
        n = len(coords)
        plan = self._plan_for(n)
        cap = _bucket(n, self.input_granularity)
        rows, valid = collate([coords], capacity=cap)
        yc, yf, ny, nums, n_in, n_drop = self._encode_fn(plan, cap)(
            self.params, rows, valid
        )
        ny = int(ny)
        if int(n_drop) or int(n_in) != n or ny >= cap:
            raise RuntimeError(
                f"capacity plan too small for frame ({n} pts, res "
                f"{self.res}): dropped={int(n_drop)} n_in={int(n_in)} "
                f"ny={ny}; raise BlockPlan.for_cloud sizing"
            )
        num_points = [int(v) for v in np.asarray(nums)]
        with open(self.filename + postfix + "_num_points.bin", "wb") as f:
            f.write(np.array(num_points, dtype=np.int32).tobytes())

        ds_coords = np.asarray(yc)[:ny, 1:] // 8
        feats = np.asarray(yf)[:ny]
        order = canonical_order(ds_coords)
        ds_coords, feats = ds_coords[order], feats[order]
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
            num_points = np.frombuffer(f.read(12), dtype=np.int32).tolist()
        n_frame = num_points[-1]
        num_points[-1] = int(rho * num_points[-1])  # ref coder.py:107

        plan = self._plan_for(max(n_frame, num_points[-1]))
        cap_y = _bucket(m, self.prune_granularity)
        rows = np.zeros((cap_y, 4), dtype=np.int32)
        rows[:m, 1:] = coords * 8
        valid = np.zeros((cap_y,), dtype=bool)
        valid[:m] = True
        f_pad = np.zeros((cap_y, feats.shape[1]), dtype=np.float32)
        f_pad[:m] = feats
        out_cap = _bucket(num_points[-1], self.input_granularity)
        nums_arr = jnp.asarray(np.array(num_points, dtype=np.int32))
        oc, cnt, n_drop = self._decode_fn(plan, out_cap)(
            self.params, rows, f_pad, valid, nums_arr
        )
        if int(n_drop):
            raise RuntimeError(
                f"decode overflowed the capacity plan "
                f"(dropped={int(n_drop)}); raise BlockPlan.for_cloud sizing"
            )
        n_out = int(cnt)
        return np.asarray(oc)[:n_out, 1:]

    def bitstream_bytes(self, postfix: str = "") -> dict:
        """Sizes of the 4 bitstream files (ref test.py:63-66)."""
        return {
            ext: os.path.getsize(self.filename + postfix + ext)
            for ext in ("_C.bin", "_F.bin", "_H.bin", "_num_points.bin")
        }
