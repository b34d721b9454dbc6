"""TF1 tensor-bundle reader/writer and reference scope mapping
(evaluation/tf_checkpoint.py) — the TF-free half of the activation-parity
chain (reference checkpoint format: train.py:528-534)."""

import numpy as np
import pytest

from facet_graph_convolution_tpu.evaluation.tf_checkpoint import (
    crc32c,
    export_unet_to_tf,
    load_reference_unet,
    map_reference_tensors,
    masked_crc32c,
    read_sstable,
    read_tf_checkpoint,
    write_sstable,
    write_tf_checkpoint,
)


def test_crc32c_known_vectors():
    # RFC 3720 / iSCSI test vectors for the Castagnoli polynomial
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    # TF's masking is an involution-free transform with a fixed offset
    assert masked_crc32c(b"123456789") == (
        (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    )


def test_sstable_roundtrip(tmp_path):
    pairs = {
        b"": b"header-bytes",
        b"alpha/weight": b"A" * 100,
        b"alpha/weight/extra": b"B",
        b"zeta": b"",
    }
    path = str(tmp_path / "t.index")
    write_sstable(path, pairs)
    assert read_sstable(path) == pairs


def test_checkpoint_roundtrip(tmp_path, rng):
    tensors = {
        "Level0/Conv/weight": rng.normal(size=(9, 32, 6)).astype(np.float32),
        "Level0/Conv/bias": rng.normal(size=(32,)).astype(np.float32),
        "scalar": np.float32(3.5).reshape(()),
        "ints": np.arange(7, dtype=np.int64),
        "flags": np.array([True, False]),
    }
    prefix = str(tmp_path / "ckpt" / "net-100")
    write_tf_checkpoint(prefix, tensors)
    out = read_tf_checkpoint(prefix)
    assert set(out) == set(tensors)
    for k in tensors:
        assert out[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(out[k], tensors[k])


def _reference_named_tensors(rng, multi_scale=False, channels=(8, 16, 32), m=4):
    """Synthesize a checkpoint in the reference's variable naming
    (model.py:853-941 scopes; 'LevelN_1' = re-entered name scope)."""
    c0, c1, c2 = channels

    def conv(scope, cin, cout):
        return {
            f"{scope}/weight": rng.normal(size=(m, cout, cin)).astype(np.float32),
            f"{scope}/bias": rng.normal(size=(cout,)).astype(np.float32),
            f"{scope}/assignment": rng.normal(size=(m, cin)).astype(np.float32),
            f"{scope}/assignment_1": rng.normal(size=(m,)).astype(np.float32),
            f"{scope}/assignment_2": rng.normal(size=(m, cin)).astype(np.float32),
        }

    def lin(scope, cin, cout):
        return {
            f"{scope}/weight": rng.normal(size=(cin, cout)).astype(np.float32),
            f"{scope}/bias": rng.normal(size=(cout,)).astype(np.float32),
        }

    t = {}
    t.update(conv("Level0/Conv", 6, c0))
    t.update(conv("Level1/Conv", c0, c1))
    t.update(conv("Level2/Conv", c1, c2))
    t.update(conv("Level2/Conv_1", c2, c2))
    t.update(conv("Level1_1/Conv", c2, c1))
    t.update(conv("Level1_1/Conv_1", 2 * c1, c1))
    t.update(conv("Level0_1/Conv", c1, c0))
    t.update(conv("Level0_1/Conv_1", 2 * c0, c0))
    t.update(lin("Level0_1/MLP", c0, 32))
    t.update(lin("Level0_1/MLP_1", 32, 3))
    if multi_scale:
        t.update(lin("Level2/MLP", c2, 32))
        t.update(lin("Level2/MLP_1", 32, 3))
        t.update(lin("Level1_1/MLP", c1, 32))
        t.update(lin("Level1_1/MLP_1", 32, 3))
    return t


def test_reference_import_runs_forward(tmp_path, rng):
    """A reference-named checkpoint imports into the pytree and the forward
    pass runs — the executed end of BASELINE's activation-parity plan."""
    import jax.numpy as jnp

    from facet_graph_convolution_tpu.evaluation.parity import capture_activations
    from tests.test_models import make_pyramid_graph

    tensors = _reference_named_tensors(rng)
    prefix = str(tmp_path / "net-5000")
    write_tf_checkpoint(prefix, tensors)

    params, multi_scale = load_reference_unet(prefix)
    assert not multi_scale
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["w"]), tensors["Level0/Conv/weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["dconv2"]["v"]), tensors["Level1_1/Conv_1/assignment_2"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["out0"]["b"]), tensors["Level0_1/MLP_1/bias"]
    )

    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    acts = capture_activations(params, x, adjs)
    assert np.isfinite(acts["out0"]).all()


def test_reference_import_multiscale_and_fallback_names(rng):
    tensors = _reference_named_tensors(rng, multi_scale=True)
    params, multi_scale = map_reference_tensors(tensors)
    assert multi_scale and "fc_coarse" in params and "out2" in params

    # graphs recorded without name-scope uniquification use LevelN/Conv_k
    renames = {
        "Level1_1/Conv": "Level1/Conv_2",
        "Level1_1/Conv_1": "Level1/Conv_3",
        "Level0_1/Conv": "Level0/Conv_2",
        "Level0_1/Conv_1": "Level0/Conv_3",
        "Level1_1/MLP": "Level1/MLP",
        "Level1_1/MLP_1": "Level1/MLP_1",
        "Level0_1/MLP": "Level0/MLP",
        "Level0_1/MLP_1": "Level0/MLP_1",
    }
    remapped = {}
    for k, v in tensors.items():
        scope, var = k.rsplit("/", 1)
        remapped[f"{renames.get(scope, scope)}/{var}"] = v
    params2, ms2 = map_reference_tensors(remapped)
    assert ms2
    np.testing.assert_array_equal(
        np.asarray(params2["upconv1"]["w"]), np.asarray(params["upconv1"]["w"])
    )


def test_export_unet_to_tf_roundtrip(tmp_path):
    """TPU-trained params export to a reference-named checkpoint and import
    back bit-identically (the reference's Saver can restore this file)."""
    import jax

    from facet_graph_convolution_tpu.models.unet import init_unet

    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       multi_scale=True)
    prefix = str(tmp_path / "export" / "net-1")
    export_unet_to_tf(prefix, params)
    back, multi_scale = load_reference_unet(prefix)
    assert multi_scale
    for layer in params:
        for var in params[layer]:
            np.testing.assert_array_equal(
                np.asarray(params[layer][var]), np.asarray(back[layer][var]),
                err_msg=f"{layer}/{var}",
            )
