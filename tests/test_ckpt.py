"""Checkpoint round-trip tests (incl. the GetAttrKey flattening
regression found by the render-CLI drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from read_tpu.pipelines import texture_pipeline as TP
from read_tpu.utils import ckpt as CK


@pytest.mark.slow
def test_roundtrip_trainstate(tmp_path):
    cfg = TP.PipelineConfig(crop_size=(32, 32))
    state, net = TP.create_state(jax.random.PRNGKey(0), n_points=100,
                                 cfg=cfg)
    path = CK.save_checkpoint(str(tmp_path / "ckpt_1"), state,
                              config={"lr": 1e-4},
                              extra={"epoch": 3})
    restored, meta = CK.load_checkpoint(path, template=state)
    assert meta["config"]["lr"] == 1e-4
    assert meta["extra"]["epoch"] == 3
    np.testing.assert_allclose(np.asarray(restored.texture),
                               np.asarray(state.texture))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_flat_keys_are_field_names(tmp_path):
    """Regression: dataclass fields must flatten to 'texture', not
    '.texture' (GetAttrKey stringification)."""
    cfg = TP.PipelineConfig(crop_size=(32, 32))
    state, _ = TP.create_state(jax.random.PRNGKey(0), n_points=10,
                               cfg=cfg)
    flat = CK._flatten(state)
    assert "texture" in flat
    assert "step" in flat
    assert any(k.startswith("params/") for k in flat)
    assert not any(k.startswith(".") for k in flat)


def test_shape_mismatch_rejected(tmp_path):
    cfg = TP.PipelineConfig(crop_size=(32, 32))
    state, _ = TP.create_state(jax.random.PRNGKey(0), n_points=10,
                               cfg=cfg)
    path = CK.save_checkpoint(str(tmp_path / "c"), state)
    other, _ = TP.create_state(jax.random.PRNGKey(0), n_points=20,
                               cfg=cfg)
    with pytest.raises(ValueError, match="shape mismatch"):
        CK.load_checkpoint(path, template=other)


@pytest.mark.slow
def test_latest_and_rotation(tmp_path):
    cfg = TP.PipelineConfig(crop_size=(32, 32))
    state, _ = TP.create_state(jax.random.PRNGKey(0), n_points=10,
                               cfg=cfg)
    for i in (1, 3, 2, 7, 5):
        CK.save_checkpoint(str(tmp_path / f"ckpt_{i}"), state)
    assert CK.latest_checkpoint(str(tmp_path)).endswith("ckpt_7")
    CK.rotate_checkpoints(str(tmp_path), "ckpt", keep=2)
    import os
    left = sorted(os.listdir(tmp_path))
    assert left == ["ckpt_5", "ckpt_7"]
