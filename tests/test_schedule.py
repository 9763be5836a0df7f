"""Multi-scale plan tests (driver config 2: 256->512->1024, BASELINE.json:8)."""

import pytest

from style_transfer_tpu.schedule import build_plan, scale_ladder


def test_doubling_ladder_to_1024():
    sizes = scale_ladder((1024, 1024), min_scale=256, factor=2.0)
    assert sizes == [(256, 256), (512, 512), (1024, 1024)]


def test_ladder_preserves_aspect_ratio():
    sizes = scale_ladder((1024, 768), min_scale=256)
    assert sizes[-1] == (1024, 768)
    for h, w in sizes:
        assert abs(h / w - 1024 / 768) < 0.05


def test_ladder_single_scale_when_small():
    assert scale_ladder((200, 200), min_scale=256) == [(200, 200)]


def test_ladder_sizes_are_even():
    for h, w in scale_ladder((1000, 333), min_scale=100):
        assert h % 2 == 0 and w % 2 == 0


def test_plan_iteration_broadcast():
    plan = build_plan((1024, 1024), [500, 300], min_scale=256)
    assert [s.iterations for s in plan] == [500, 300, 300]
    assert [s.size for s in plan] == [(256, 256), (512, 512), (1024, 1024)]
    assert [s.index for s in plan] == [0, 1, 2]


def test_plan_validates():
    with pytest.raises(ValueError):
        build_plan((512, 512), [])
    with pytest.raises(ValueError):
        scale_ladder((512, 512), factor=1.0)


def test_chunk_lengths():
    from style_transfer_tpu.schedule import chunk_lengths

    assert chunk_lengths(100, 25) == [25, 25, 25, 25]
    assert chunk_lengths(60, 25) == [25, 25, 10]
    assert chunk_lengths(10, 25) == [10]
    assert chunk_lengths(25, 25) == [25]
    assert chunk_lengths(0, 25) == []
    # invariant: the lengths partition the iteration count
    for iters in (1, 7, 24, 25, 26, 99, 250):
        assert sum(chunk_lengths(iters, 25)) == iters
