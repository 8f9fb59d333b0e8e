"""End-to-end codec round-trip tests (the reference has none — SURVEY.md §4)."""

import jax
import numpy as np
import optax
import pytest

from pcgcv2_tpu.codec import octree
from pcgcv2_tpu.codec.coder import Coder, canonical_order
from pcgcv2_tpu.config import BlockPlan
from pcgcv2_tpu.data.synthetic import sphere_cloud
from pcgcv2_tpu.data.voxelize import collate
from pcgcv2_tpu.models import PCCModel
from pcgcv2_tpu.train.loss import rd_loss


@pytest.fixture(autouse=True, scope="module")
def _production_dtypes():
    """Run this module's full-model compiles in production dtype mode.

    The suite-wide x64 flag (conftest) exists ONLY for the int64-key sparse
    oracle; under x64, XLA:CPU's backward-pass compiles blow up 10-25x
    (measured: 164 s f32 vs 25-70 min f64 for the same train-step graph —
    the round-3 suite stall).  Full-model tests neither use the oracle nor
    ship f64 anywhere, so they compile f32 like production."""
    import jax

    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)



@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    """Shared Coder (jit caches live per instance) + raw and briefly-trained
    params."""
    train_cloud = sphere_cloud(32, density=1.2, seed=7)
    coords, valid = collate([train_cloud], capacity=2048)
    plan = BlockPlan(res=64, nb=(256, 128, 64, 64))
    from tests._tiny import TINY_MODEL

    model = PCCModel(config=TINY_MODEL, plan=plan, num_batches=1)
    params = jax.jit(
        lambda k1, k2: model.init(
            {"params": k1, "noise": k2}, coords, valid, True
        )
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1))

    def overfit(n_steps):
        """Overfit params on train_cloud (used only by the slow
        reconstruction test; CPU steps are expensive)."""
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, opt, rng):
            def loss_fn(p):
                out = model.apply(
                    p, coords, valid, True, rngs={"noise": rng}
                )
                return rd_loss(out, alpha=4.0, beta=1.0)["loss"]

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(p, up), opt, loss

        trained, rng = params, jax.random.PRNGKey(9)
        for _ in range(n_steps):
            rng, sub = jax.random.split(rng)
            trained, opt, _ = step(trained, opt, sub)
        return trained

    out = tmp_path_factory.mktemp("codec")
    coder = Coder(
        params, str(out / "frame"), res=64, model_config=TINY_MODEL,
        input_granularity=4096, prune_granularity=512,
    )
    return dict(
        coder=coder, params=params, overfit=overfit,
        train_cloud=train_cloud,
    )


def test_roundtrip_bottleneck_exact(ctx):
    """The decoder must rebuild the encoder's quantized bottleneck exactly —
    the bitstream invertibility contract (ref coder.py:80-112)."""
    cloud = sphere_cloud(48, density=1.5, seed=3)
    coder = ctx["coder"]
    enc_coords, enc_feats = coder.encode(cloud, postfix="_bx")

    dec_coords = coder.coordinate_coder.decode("_bx")
    dec_coords = dec_coords[canonical_order(dec_coords)]
    dec_feats = coder.feature_coder.decode("_bx")

    np.testing.assert_array_equal(dec_coords, enc_coords)
    np.testing.assert_array_equal(dec_feats, enc_feats)


def test_roundtrip_output_counts(ctx):
    cloud = sphere_cloud(48, density=1.5, seed=4)
    coder = ctx["coder"]
    coder.encode(cloud, postfix="_rc")
    out = coder.decode(rho=1.0, postfix="_rc")
    assert out.shape == (len(cloud), 3)
    assert len(np.unique(out, axis=0)) == len(out)
    assert (out >= 0).all() and (out < 64).all()
    out2 = coder.decode(rho=1.0, postfix="_rc")
    np.testing.assert_array_equal(out, out2)


def test_rho_density_knob(ctx):
    """rho scales only the final-scale point count (ref coder.py:107)."""
    cloud = sphere_cloud(48, density=1.5, seed=5)
    coder = ctx["coder"]
    coder.encode(cloud, postfix="_rh")
    half = coder.decode(rho=0.5, postfix="_rh")
    assert len(half) == len(cloud) // 2
    dense = coder.decode(rho=1.5, postfix="_rh")
    assert len(dense) == int(1.5 * len(cloud))


def test_bitstream_files_exist(ctx):
    cloud = sphere_cloud(32, density=1.0, seed=6)
    coder = ctx["coder"]
    coder.encode(cloud, postfix="_r1")
    sizes = coder.bitstream_bytes(postfix="_r1")
    assert set(sizes) == {"_C.bin", "_F.bin", "_H.bin", "_num_points.bin"}
    # 3 per-scale GT voxel counts (ref semantics) + 4 measured per-scale
    # occupied-block counts for the decoder's exact-fit plan
    assert sizes["_num_points.bin"] == 28
    assert sizes["_H.bin"] == 8 + 1 + 4 + 4  # ref header layout coder.py:51-55
    assert sizes["_C.bin"] > 0


def test_decode_accepts_legacy_12_byte_header(ctx):
    """Round-3 streams carry only the 3 GT voxel counts; the decoder must
    fall back to the density-prior plan and still reconstruct."""
    cloud = sphere_cloud(48, density=1.5, seed=8)
    coder = ctx["coder"]
    coder.encode(cloud, postfix="_lg")
    new = coder.decode(rho=1.0, postfix="_lg")

    hdr = coder.filename + "_lg_num_points.bin"
    with open(hdr, "rb") as f:
        full = f.read()
    assert len(full) == 28
    with open(hdr, "wb") as f:
        f.write(full[:12])  # strip the round-4 block-count extension
    legacy = coder.decode(rho=1.0, postfix="_lg")
    np.testing.assert_array_equal(
        legacy[canonical_order(legacy)], new[canonical_order(new)]
    )


def test_coordinate_codec_roundtrips_any_order(ctx):
    """Property test: random coordinate sets round-trip bit-exactly through
    the built-in octree codec regardless of input order, and the canonical
    order is reproducible on both sides (VERDICT missing #4)."""
    rng = np.random.RandomState(3)
    for trial in range(3):
        pts = np.unique(rng.randint(0, 64, size=(500, 3)), axis=0)
        shuffled = pts[rng.permutation(len(pts))]
        blob = octree.encode(shuffled)
        dec = octree.decode(blob)
        # set equality
        np.testing.assert_array_equal(
            np.unique(dec, axis=0), np.unique(pts, axis=0)
        )
        # canonical order is invariant to what order the codec emits
        np.testing.assert_array_equal(
            dec[canonical_order(dec)], pts[canonical_order(pts)]
        )


@pytest.mark.slow
def test_trained_model_reconstructs(ctx):
    """After brief training on one cloud, the codec round-trip must
    reconstruct most of that cloud's voxels (encode->bits->decode).
    Slow: ~100 CPU training steps of the tiny model."""
    coder, cloud = ctx["coder"], ctx["train_cloud"]
    old = coder.params
    try:
        coder.params = ctx["overfit"](100)
        coder.encode(cloud, postfix="_tr")
        out = coder.decode(postfix="_tr")
    finally:
        coder.params = old
    assert len(out) == len(cloud)
    gt = {tuple(r) for r in cloud}
    got = {tuple(r) for r in out}
    iou = len(gt & got) / len(gt | got)
    assert iou > 0.3, f"IoU {iou:.3f} too low — codec not learning"
