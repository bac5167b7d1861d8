"""Tests for core.render feature-array extraction (ObservationToFeatureArray
parity, ``pycolab/rendering.py:552-660``)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from ai_safety_gridworlds_tpu.core.render import (
    ObservationToFeatureArray,
    feature_array,
)


def _layers():
    a = np.array([[1, 1, 0], [0, 1, 0]], dtype=bool)
    b = np.array([[0, 0, 1], [1, 0, 0]], dtype=bool)
    return {"a": a, "b": b}


def test_feature_array_stacks_and_zero_fills():
    layers = _layers()
    out = np.asarray(feature_array(layers, "bXa"))
    assert out.shape == (3, 2, 3)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out[0], layers["b"].astype(np.float32))
    np.testing.assert_array_equal(out[1], np.zeros((2, 3), np.float32))
    np.testing.assert_array_equal(out[2], layers["a"].astype(np.float32))


def test_feature_array_permute_hwc():
    layers = _layers()
    out = np.asarray(feature_array(layers, "ab", permute=(1, 2, 0)))
    assert out.shape == (2, 3, 2)
    np.testing.assert_array_equal(
        out[..., 0], layers["a"].astype(np.float32)
    )


def test_feature_array_guards():
    layers = _layers()
    with pytest.raises(ValueError):
        feature_array(layers, "ab", permute=(0, 1, 1))
    with pytest.raises(RuntimeError):
        feature_array(layers, "XY")
    with pytest.raises(ValueError):
        ObservationToFeatureArray("ab", permute=(2, 2, 0))


def test_callable_accepts_observation_dicts():
    layers = _layers()
    conv = ObservationToFeatureArray("ab")
    via_dict = np.asarray(conv({"layers": layers, "board": None}))
    via_bare = np.asarray(conv(layers))
    np.testing.assert_array_equal(via_dict, via_bare)


@pytest.mark.skipif(
    not reference_available(), reason="reference checkout unavailable"
)
@pytest.mark.parametrize("permute", [None, (1, 2, 0), (2, 0, 1)])
def test_feature_array_matches_reference(permute):
    add_reference_to_path()
    from pycolab import rendering as ref_rendering

    layers = _layers()
    board = np.where(layers["a"], ord("a"), ord(" ")).astype(np.uint8)
    board = np.where(layers["b"], ord("b"), board)
    ref_obs = ref_rendering.Observation(board=board, layers=layers)
    ref = ref_rendering.ObservationToFeatureArray("bXa", permute=permute)(
        ref_obs
    )
    ours = np.asarray(feature_array(layers, "bXa", permute=permute))
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_repaint_matches_reference_repainter():
    """ObservationCharacterRepainter differential: random boards/mappings
    through both implementations give identical repainted boards and
    merged layers."""
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.rendering import (
        Observation,
        ObservationCharacterRepainter,
    )

    import jax.numpy as jnp

    from ai_safety_gridworlds_tpu.core.render import (
        char_repainter_lut,
        repaint,
    )

    rng = np.random.RandomState(0)
    chars = list(" #ABab%")
    mapping = {"A": "#", "a": "b", "%": " "}
    ref_rp = ObservationCharacterRepainter(mapping)
    lut = char_repainter_lut(mapping)
    for trial in range(20):
        board = np.array(
            [[ord(rng.choice(chars)) for _ in range(9)] for _ in range(7)],
            np.uint8,
        )
        layers = {
            c: board == ord(c) for c in chars
        }
        ref_out = ref_rp(Observation(board=board, layers=layers))
        ours = np.asarray(repaint(jnp.asarray(board), jnp.asarray(lut)))
        np.testing.assert_array_equal(
            np.asarray(ref_out.board), ours, err_msg=f"trial {trial}"
        )
