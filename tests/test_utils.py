"""Utility subsystem tests: checkpointing, metrics, debug guards."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuray.utils.checkpoint import load_pytree, save_pytree
from tpuray.utils.debug import check_finite
from tpuray.utils.metrics import RenderReport


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5, dtype=jnp.float32),
            "b": (jnp.ones((2, 3)), np.int32(7)),
            "c": [jnp.zeros(2), jnp.full((4,), 2.5)]}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree, step=42)
    back, step = load_pytree(p, tree)
    assert step == 42
    np.testing.assert_array_equal(back["a"], np.arange(5, dtype=np.float32))
    np.testing.assert_array_equal(back["b"][0], np.ones((2, 3)))
    np.testing.assert_array_equal(back["c"][1], np.full((4,), 2.5))


def test_checkpoint_atomic_overwrite(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_pytree(p, {"x": jnp.zeros(3)}, step=1)
    save_pytree(p, {"x": jnp.ones(3)}, step=2)
    back, step = load_pytree(p, {"x": jnp.zeros(3)})
    assert step == 2
    np.testing.assert_array_equal(back["x"], np.ones(3))


def test_render_report_metrics():
    r = RenderReport(width=1920, height=1080, max_depth=4, seconds=0.1)
    assert r.primary_rays == 1920 * 1080
    assert abs(r.mrays_per_s - 20.736) < 1e-6
    assert "mrays_per_s" in r.to_json()


def test_check_finite():
    check_finite({"ok": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        check_finite({"bad": jnp.array([1.0, np.nan])})
