"""Model architecture tests (shapes, masked pooling, tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.models import (
    ResNet,
    SENet50,
    VGGMStudent,
    temporal_valid_frames,
)


@pytest.fixture(scope="module")
def student():
    model = VGGMStudent(fc6_features=64, fc7_features=32)
    x = jnp.zeros((1, 512, 400, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_student_output_shape(student):
    model, variables = student
    logits = model.apply(variables, jnp.zeros((2, 512, 400, 1)))
    assert logits.shape == (2, 8)
    assert logits.dtype == jnp.float32


def test_temporal_valid_frames_bucket_parity():
    """4 s (400-frame) input pools over 11 temporal positions, matching the
    reference's pool6=[1 11] bucket entry (emoVoxZoo.m:256-269)."""
    assert temporal_valid_frames(400) == 11
    assert temporal_valid_frames(300) == 8


def test_masked_pool_equals_trimmed_forward(student):
    """The masked-mean pool on padded input must equal a forward on the
    trimmed input — the static-shape replacement for the reference's
    per-sample poolSize surgery (compute_audio_feats.m:121-125)."""
    model, variables = student
    rng = np.random.RandomState(0)
    spec_300 = rng.randn(1, 512, 300, 1).astype(np.float32)
    padded = np.zeros((1, 512, 400, 1), np.float32)
    padded[:, :, :300] = spec_300
    out_trim = model.apply(variables, jnp.asarray(spec_300))
    out_mask = model.apply(
        variables, jnp.asarray(padded), valid_frames=jnp.asarray([300])
    )
    np.testing.assert_allclose(
        np.asarray(out_trim), np.asarray(out_mask), atol=2e-2, rtol=2e-2
    )


def test_student_batch_independence(student):
    """Samples in a batch must not leak into each other (test mode)."""
    model, variables = student
    rng = np.random.RandomState(1)
    a = rng.randn(1, 512, 400, 1).astype(np.float32)
    b = rng.randn(1, 512, 400, 1).astype(np.float32)
    out_a = model.apply(variables, jnp.asarray(a))
    out_ab = model.apply(variables, jnp.asarray(np.concatenate([a, b])))
    np.testing.assert_allclose(np.asarray(out_a)[0], np.asarray(out_ab)[0], atol=1e-3)


@pytest.fixture(scope="module")
def tiny_resnet():
    model = ResNet(stage_sizes=(1, 1), width=8, use_se=True, num_outputs=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_tiny_senet_forward(tiny_resnet):
    model, variables = tiny_resnet
    logits = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 8)


def test_senet_train_mode_updates_batch_stats(tiny_resnet):
    model, variables = tiny_resnet
    x = jnp.ones((2, 64, 64, 3))
    _, new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new)
    )


def test_se_block_gating(tiny_resnet):
    """SE gate in (0,1): output magnitude never exceeds un-gated input."""
    from mcncrossmodalemotions_tpu.models import SEBlock

    block = SEBlock(features=16)
    x = jnp.ones((1, 4, 4, 16))
    variables = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(variables, x)
    assert np.all(np.abs(np.asarray(y)) <= 1.0 + 1e-6)


def _masked_bn_case(model, variables, x_valid, pad_rows=3, **apply_kw):
    """Shared masked-BN assertion: train-mode batch_stats from a padded
    batch + pad_mask must equal the stats from the valid rows alone
    (the reference engine simply ran the smaller final batch), while the
    UNMASKED padded batch must differ (the contamination being removed).

    Tolerance note: the masked stats are exact in the f32 reduction, but
    each BN's *output* is bf16; a 1-ulp flip there cascades through the
    later convs, so deep-layer stats agree to bf16 resolution (~0.5%
    rel / 7e-4 abs measured), while unmasked contamination is 50x that
    (0.037 abs / >100% rel measured) — the tolerances sit between.
    """
    x_pad = np.concatenate([x_valid, np.repeat(x_valid[-1:], pad_rows, 0)])
    mask = np.zeros(len(x_pad), np.float32)
    mask[: len(x_valid)] = 1.0
    _, ref = model.apply(variables, jnp.asarray(x_valid), train=True,
                         mutable=["batch_stats"], **apply_kw)
    _, masked = model.apply(variables, jnp.asarray(x_pad), train=True,
                            pad_mask=jnp.asarray(mask),
                            mutable=["batch_stats"], **apply_kw)
    _, unmasked = model.apply(variables, jnp.asarray(x_pad), train=True,
                              mutable=["batch_stats"], **apply_kw)
    ref_l = jax.tree.leaves(ref["batch_stats"])
    masked_l = jax.tree.leaves(masked["batch_stats"])
    unmasked_l = jax.tree.leaves(unmasked["batch_stats"])
    tol = dict(atol=2e-3, rtol=2e-2)
    for r, m in zip(ref_l, masked_l):
        np.testing.assert_allclose(np.asarray(r), np.asarray(m), **tol)
    assert any(not np.allclose(np.asarray(r), np.asarray(u), **tol)
               for r, u in zip(ref_l, unmasked_l))


def test_student_masked_bn_excludes_padded_rows(student):
    """pad_mask makes VGGMStudent's train-mode BN stats exact over the
    valid rows of a ragged mesh-padded batch (train/engine._to_device)."""
    model, variables = student
    x = np.random.RandomState(3).randn(5, 512, 100, 1).astype(np.float32)
    _masked_bn_case(model, variables, x)


def test_resnet_masked_bn_excludes_padded_rows(tiny_resnet):
    model, variables = tiny_resnet
    x = np.random.RandomState(4).randn(5, 64, 64, 3).astype(np.float32)
    _masked_bn_case(model, variables, x)


def test_vggface_masked_bn_excludes_padded_rows():
    from mcncrossmodalemotions_tpu.models.vggface import VGGFace

    model = VGGFace(arch="m", use_batchnorm=True, width_multiplier=1 / 16,
                    fc_features=64)
    x = np.random.RandomState(5).randn(5, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    _masked_bn_case(model, variables, x)


def test_embedding_output(student):
    model, variables = student
    logits, emb = model.apply(
        variables, jnp.zeros((2, 512, 400, 1)), return_embedding=True
    )
    assert logits.shape == (2, 8)
    assert emb.shape == (2, 32)


def test_surgery_reinit_head(student):
    from mcncrossmodalemotions_tpu.models import surgery

    model, variables = student
    new_vars = surgery.reinit_head(variables, num_outputs=5,
                                   rng=jax.random.PRNGKey(0), scale=1e-4)
    assert new_vars["params"]["prediction"]["kernel"].shape[-1] == 5
    assert float(jnp.abs(new_vars["params"]["prediction"]["kernel"]).max()) < 1e-2
    # backbone untouched
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))


def test_surgery_transplant_backbone(student):
    from mcncrossmodalemotions_tpu.models import surgery

    model, variables = student
    zeros = jax.tree.map(jnp.zeros_like, variables)
    merged = surgery.transplant_backbone(zeros, variables)
    # backbone copied from source...
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))
    # ...head kept from target (zeros)
    assert float(jnp.abs(merged["params"]["prediction"]["kernel"]).max()) == 0


def test_surgery_shape_mismatch_raises(student):
    from mcncrossmodalemotions_tpu.models import surgery

    model, variables = student
    bad = jax.tree.map(jnp.zeros_like, variables)
    bad["params"]["conv1"]["kernel"] = jnp.zeros((1, 1, 1, 1))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        surgery.transplant_backbone(bad, variables)


def test_host_warp_matches_device_warp(rng):
    """The numpy host sampler and the jnp device sampler must agree —
    both implement the vl_nnbilinearsampler convention."""
    from mcncrossmodalemotions_tpu.ops.warp import (
        random_augmentation_thetas_np,
        warp_images,
        warp_images_np,
    )

    images = rng.randint(0, 255, (3, 24, 24, 1)).astype(np.float32)
    theta = random_augmentation_thetas_np(rng, 3, apply_prob=1.0)
    host = warp_images_np(images, theta, 24, 24)
    device = np.asarray(warp_images(jnp.asarray(images), jnp.asarray(theta),
                                    24, 24))
    np.testing.assert_allclose(host, device, atol=1e-3)


def test_augment_batch_np_half_identity(rng):
    """augment_batch_np leaves ~half the batch untouched (apply_prob=0.5)."""
    from mcncrossmodalemotions_tpu.ops.warp import augment_batch_np

    images = rng.randint(0, 255, (64, 16, 16, 1)).astype(np.uint8)
    out = augment_batch_np(images, np.random.RandomState(0))
    unchanged = sum(np.array_equal(out[i], images[i]) for i in range(64))
    assert 16 <= unchanged <= 48


def test_resize_separable_matches_host_convention(rng):
    """The separable MXU resize must match the canonical align-corners
    numpy resize (same convention as the C++ service and warp samplers)."""
    from mcncrossmodalemotions_tpu.data.images import resize_bilinear_np
    from mcncrossmodalemotions_tpu.ops.warp import resize_separable

    img = rng.randint(0, 255, (2, 48, 48, 1)).astype(np.float32)
    got = np.asarray(resize_separable(jnp.asarray(img), 224, 224))
    for b in range(2):
        ref = resize_bilinear_np(img[b], 224, 224)
        np.testing.assert_allclose(got[b], ref, atol=1e-2)


def test_resize_separable_identity_and_downscale(rng):
    from mcncrossmodalemotions_tpu.ops.warp import resize_separable

    img = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    same = resize_separable(img, 16, 16)
    assert same is img  # no-op fast path
    down = np.asarray(resize_separable(img, 8, 8))
    assert down.shape == (1, 8, 8, 3)
    assert np.isfinite(down).all()


# ---------------------------------------------------------------------------
# Classic VGG face teachers (models/vggface.py, ferPlusZoo.m:44-59)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,arch,bn", [
    ("vgg_face", "vd", False),
    ("vgg-vd-face-sfew", "vd", False),
    ("vgg-m-face-bn-fer", "m", True),
])
def test_classic_teacher_registry(name, arch, bn):
    from mcncrossmodalemotions_tpu.zoo import build_teacher

    m = build_teacher(name, tiny=True)
    assert type(m).__name__ == "VGGFace"
    assert m.arch == arch
    assert m.use_batchnorm == bn


def test_classic_teacher_usebnorm_insertion():
    """The useBnorm option (ferPlusZoo.m:123) retrofits BN into the
    BN-less classics; BN params must appear in the variable tree."""
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.zoo import build_teacher

    x = jnp.zeros((1, 64, 64, 3))
    plain = build_teacher("vgg_face", tiny=True)
    v_plain = plain.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in v_plain
    with_bn = build_teacher("vgg_face", use_bnorm=True, tiny=True)
    v_bn = with_bn.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in v_bn
    assert any(k.startswith("bn_") for k in v_bn["params"])


@pytest.mark.parametrize("arch", ["vd", "m"])
def test_vggface_forward_and_embedding(arch):
    import numpy as np
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.models import VGGFace

    model = VGGFace(arch=arch, width_multiplier=1 / 16, fc_features=32,
                    num_outputs=8, use_batchnorm=True)
    size = 64 if arch == "vd" else 96  # vgg-m geometry needs >= 75 px
    x = jnp.asarray(np.random.RandomState(0).randn(2, size, size, 3)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, emb = model.apply(variables, x, return_embedding=True)
    assert logits.shape == (2, 8)
    assert emb.shape[0] == 2 and emb.shape[1] >= 8
    assert np.isfinite(np.asarray(logits)).all()
    # head carries the 1/100 re-init scale (ferPlusZoo.m:163-168)
    k = np.asarray(variables["params"]["prediction"]["kernel"])
    assert abs(k.std() - 0.01) < 0.005


def test_classic_teacher_ferplus_driver(tmp_path):
    """A classic VGG teacher trains end to end through the FER+ driver."""
    from mcncrossmodalemotions_tpu.data.ferplus import build_synthetic_ferplus
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        ferplus_baselines,
    )

    imdb = build_synthetic_ferplus(32)
    cfg = FerPlusConfig(model="vgg-m-face-bn", batch_size=16,
                        tiny_model=True, input_size=96, dropout=0.0,
                        lr_values=(0.05,), lr_epochs=(1,),
                        out_root=str(tmp_path))
    _, history = ferplus_baselines(cfg, imdb)
    assert len(history) == 1
    import numpy as np

    assert np.isfinite(history[-1]["train"]["loss"])


def test_bilinear_sampler_matches_scipy_map_coordinates(rng):
    """Independent parity for the bilinear sampler (vl_nnbilinearsampler
    twin): sampling at an affine grid must equal
    scipy.ndimage.map_coordinates(order=1) at the same pixel
    coordinates (align-corners [-1,1] -> pixel mapping, clamped
    borders via mode='nearest')."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.ndimage import map_coordinates

    from mcncrossmodalemotions_tpu.ops.warp import (
        affine_grid,
        bilinear_sample,
    )

    b, h, w = 2, 17, 23
    images = rng.rand(b, h, w, 1).astype(np.float32)
    theta = np.asarray(
        [[[0.9, -0.12, 0.05], [0.1, 1.05, -0.08]],
         [[1.1, 0.0, -0.2], [0.0, 0.8, 0.15]]], np.float32)
    grid = np.asarray(affine_grid(jnp.asarray(theta), h, w))
    got = np.asarray(bilinear_sample(jnp.asarray(images), jnp.asarray(grid)))

    xs = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    ys = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    for k in range(b):
        ref = map_coordinates(images[k, :, :, 0].astype(np.float64),
                              [ys[k].ravel(), xs[k].ravel()],
                              order=1, mode="nearest").reshape(h, w)
        np.testing.assert_allclose(got[k, :, :, 0], ref, atol=2e-6)


def test_conv1_s2d_matches_plain_conv(student):
    """SpaceToDepthConv1 is numerically the SAME function as the plain
    7x7/s2 conv1: identical param tree, matching logits on even extents,
    and an automatic plain-conv fallback on odd widths."""
    model, variables = student
    plain = VGGMStudent(fc6_features=64, fc7_features=32, conv1_s2d=False)
    # identical variable trees (same names, shapes) — checkpoints and
    # released-weight imports are layout-agnostic
    s2d_shapes = jax.tree.map(jnp.shape, variables)
    plain_shapes = jax.tree.map(
        jnp.shape, jax.eval_shape(plain.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 512, 400, 1))))
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     s2d_shapes, plain_shapes))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 512, 400, 1).astype(np.float32))
    ref = plain.apply(variables, x)
    got = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)  # bf16 accum order

    # odd width: s2d path must fall back, same variables still apply
    x_odd = jnp.asarray(rng.randn(1, 512, 399, 1).astype(np.float32))
    np.testing.assert_allclose(np.asarray(model.apply(variables, x_odd)),
                               np.asarray(plain.apply(variables, x_odd)),
                               atol=1e-6)


def test_conv1_s2d_init_equals_plain_init():
    """Param init draws are identical across the two conv1 forms (same
    param path/shape/initializer), so seeded from-scratch runs don't
    fork on the layout choice."""
    x = jnp.zeros((1, 512, 400, 1))
    v_s2d = VGGMStudent(fc6_features=64, fc7_features=32).init(
        jax.random.PRNGKey(7), x)
    v_plain = VGGMStudent(fc6_features=64, fc7_features=32,
                          conv1_s2d=False).init(jax.random.PRNGKey(7), x)
    for a, b in zip(jax.tree.leaves(v_s2d), jax.tree.leaves(v_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resnet_downsamples_at_the_reduce_conv():
    """Released VGGFace2/SENet teachers are Caffe-trained: the
    stage-entry stride lives on the 1x1_reduce (our conv1), NOT the 3x3
    (torchvision v1.5), and the stem pool is pad-0 ceil-mode. Imported
    weights must downsample where they were trained to."""
    from mcncrossmodalemotions_tpu.models.resnet import ResNet

    model = ResNet(stage_sizes=(1, 1), width=8, num_outputs=4)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, inter = model.apply(variables, x, capture_intermediates=True,
                           mutable=["intermediates"])
    inter = inter["intermediates"]
    # stage-2 entry block: conv1 output already at the downsampled size
    c1 = inter["layer2_0"]["conv1"]["__call__"][0]
    c2 = inter["layer2_0"]["conv2"]["__call__"][0]
    assert c1.shape[1:3] == c2.shape[1:3] == (8, 8), (c1.shape, c2.shape)
    # stem: 64 -> conv1/s2 -> 32 -> pad-0 ceil pool -> 16
    stem = inter["layer1_0"]["conv1"]["__call__"][0]
    assert stem.shape[1:3] == (16, 16), stem.shape
