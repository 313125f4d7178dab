"""Native C++ runtime tests: build, exact assignment vs SciPy, CSV parse,
gray conversion, frame ring (SURVEY.md §2 native-component checklist)."""

import numpy as np
import pytest

from tpu_mot import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.ensure_built():
        pytest.skip("g++ unavailable — native lib not built")


def test_assign_exact_vs_scipy():
    from tpu_mot.ops.assignment import scipy_assign, assignment_cost

    rng = np.random.default_rng(0)
    for shape in [(5, 5), (12, 7), (7, 12), (40, 40), (1, 1)]:
        cost = rng.uniform(0, 2, shape).astype(np.float64)
        feasible = rng.random(shape) > 0.3
        got = native.assign(cost, feasible)
        want = scipy_assign(cost, feasible)
        assert (got >= 0).sum() == (want >= 0).sum()
        np.testing.assert_allclose(assignment_cost(cost, got),
                                   assignment_cost(cost, want), rtol=1e-9)
        matched = got[got >= 0]
        assert len(set(matched.tolist())) == len(matched)
        for r, c in enumerate(got):
            if c >= 0:
                assert feasible[r, c]


def test_assign_all_infeasible():
    got = native.assign(np.ones((3, 3)), np.zeros((3, 3), bool))
    assert (got == -1).all()


def test_parse_mot_csv(tmp_path):
    p = tmp_path / "det.txt"
    p.write_text("1,-1,10.5,20,30,40,0.9,-1,-1,-1\n"
                 "2,-1,11,21,31,41,0.8,-1,-1,-1\n"
                 "garbage line\n"
                 "3,-1,12,22,32,42,0.7\n")
    rows = native.parse_mot_csv(str(p))
    assert rows.shape == (3, 7)
    np.testing.assert_allclose(rows[0], [1, -1, 10.5, 20, 30, 40, 0.9])
    np.testing.assert_allclose(rows[2], [3, -1, 12, 22, 32, 42, 0.7])


def test_bgr_to_gray_matches_numpy():
    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 256, (32, 48, 3), np.uint8)
    got = native.bgr_to_gray(bgr)
    b = bgr.astype(np.uint32)
    want = ((77 * b[..., 2] + 150 * b[..., 1] + 29 * b[..., 0]) >> 8
            ).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_frame_ring_spsc():
    ring = native.FrameRing(capacity=4, frame_bytes=64)
    frames = [np.arange(64, dtype=np.uint8) + i for i in range(6)]
    assert len(ring) == 0
    for i in range(4):
        assert ring.push(frames[i])
    assert not ring.push(frames[4])          # full
    assert len(ring) == 4
    out = ring.pop((64,))
    np.testing.assert_array_equal(out, frames[0])
    assert ring.push(frames[4])               # space again
    for i in (1, 2, 3, 4):
        np.testing.assert_array_equal(ring.pop((64,)), frames[i])
    assert ring.pop((64,)) is None
