"""TriangleMix mask semantics vs a literal transcription of the documented
rules (reference trianglemix_attention.py:53-219, SURVEY.md §0.1)."""

import numpy as np
import pytest

from vllm_trianglemix_tpu.attention import trianglemix as tm
from vllm_trianglemix_tpu.config import TriangleMixConfig

CFG = TriangleMixConfig(enabled=True, num_sink_tokens=4,
                        sliding_window_size=32, num_last_tokens=64)


def loop_masks(n, cfg):
    """Direct per-element transcription of the documented mask formulas."""
    si, sl, last = (cfg.num_sink_tokens, cfg.sliding_window_size,
                    cfg.num_last_tokens)
    streaming = np.zeros((n, n), bool)
    lastm = np.zeros((n, n), bool)
    middle = np.zeros((n, n), bool)
    for i in range(n):
        for j in range(n):
            if i < j:
                continue
            if j <= si or i - j <= sl:
                streaming[i, j] = True
            elif n - i < last:
                lastm[i, j] = True
            else:
                middle[i, j] = True
    return streaming, lastm, middle


@pytest.mark.parametrize("n", [1, 7, 65, 200])
def test_masks_match_reference_rules(n):
    streaming, last, middle = loop_masks(n, CFG)
    np.testing.assert_array_equal(np.asarray(tm.streaming_mask(n, CFG)), streaming)
    np.testing.assert_array_equal(np.asarray(tm.last_mask(n, CFG)), last)
    np.testing.assert_array_equal(np.asarray(tm.middle_mask(n, CFG)), middle)
    np.testing.assert_array_equal(np.asarray(tm.triangle_mask(n, CFG)),
                                  streaming | last)


def test_partition_of_causal_set():
    n = 300
    s = np.asarray(tm.streaming_mask(n, CFG))
    l = np.asarray(tm.last_mask(n, CFG))
    m = np.asarray(tm.middle_mask(n, CFG))
    causal = np.asarray(tm.dense_causal_mask(n))
    # streaming/last/middle partition the causal entries.
    assert not (s & l).any() and not (s & m).any() and not (l & m).any()
    np.testing.assert_array_equal(s | l | m, causal)


def test_density_reduction_at_4096():
    # Reference claims ~4x compute reduction at seq 4096
    # (TRIANGLEMIX_QUICK_REFERENCE.md:260-276).
    density = tm.attention_density(4096, CFG)
    assert density < 0.30  # >3.3x reduction
    assert density > 0.01


def test_additive_conversion():
    n = 16
    add = np.asarray(tm.to_additive(tm.dense_causal_mask(n)))
    assert add[5, 3] == 0.0
    assert np.isneginf(add[3, 5])


def test_layer_mask_policy():
    cfg = TriangleMixConfig(enabled=True, num_triangle_layers=2,
                            dense_threshold=2048)
    # Short sequences: dense for every layer.
    assert tm.get_layer_mask(2048, 0, cfg) is None
    # Long: triangle on selected layers only.
    assert tm.get_layer_mask(2049, 0, cfg) is not None
    assert tm.get_layer_mask(2049, 5, cfg) is None


def test_layer_selection_policies():
    cfg = TriangleMixConfig(enabled=True, num_triangle_layers=3)
    assert cfg.triangle_layers(6) == [0, 1, 2]
    cfg2 = TriangleMixConfig(enabled=True, triangle_layer_indices=[1, 4])
    assert cfg2.triangle_layers(6) == [1, 4]
    cfg3 = TriangleMixConfig(enabled=False, num_triangle_layers=3)
    assert cfg3.triangle_layers(6) == []


def test_qwen3_presets():
    # reference trianglemix_config.py:59-81
    assert TriangleMixConfig.for_qwen3("14B").num_triangle_layers == 10
    assert TriangleMixConfig.for_qwen3("32B").num_triangle_layers == 12
    assert TriangleMixConfig.for_qwen3("7B").num_triangle_layers == 8


@pytest.mark.parametrize("n,bq,bk", [(512, 64, 64), (777, 128, 16),
                                     (4096, 256, 64)])
def test_block_map_consistent_with_token_mask(n, bq, bk):
    ref = np.asarray(tm.triangle_mask(n, CFG))
    bmap = tm.build_block_map(n, bq, bk, CFG)
    nq, nk = bmap.shape
    for qi in range(nq):
        for ki in range(nk):
            qs, qe = qi * bq, min((qi + 1) * bq, n)
            ks, ke = ki * bk, min((ki + 1) * bk, n)
            tile = ref[qs:qe, ks:ke]
            kind = bmap[qi, ki]
            if kind == tm.BlockKind.SKIP:
                assert not tile.any(), (qi, ki)
            elif kind == tm.BlockKind.FULL:
                # fully visible and strictly causal
                assert tile.all(), (qi, ki)
            else:
                # partial tiles: exact per-token mask must reproduce ref
                sub = np.asarray(
                    tm.token_mask_for_tile(qs, ks, bq, bk, n, CFG))
                np.testing.assert_array_equal(sub[:qe - qs, :ke - ks], tile)


def test_block_map_skips_most_middle_blocks():
    bmap = tm.build_block_map(4096, 128, 128, CFG)
    frac_skip = (bmap == tm.BlockKind.SKIP).mean()
    assert frac_skip > 0.5  # most of the causal middle is never touched


def test_dense_block_map_is_causal_only():
    bmap = tm.build_block_map(512, 64, 64, CFG, triangle=False)
    ref = np.asarray(tm.dense_causal_mask(512))
    nq, nk = bmap.shape
    for qi in range(nq):
        for ki in range(nk):
            tile = ref[qi * 64:(qi + 1) * 64, ki * 64:(ki + 1) * 64]
            if bmap[qi, ki] == tm.BlockKind.SKIP:
                assert not tile.any()
            elif bmap[qi, ki] == tm.BlockKind.FULL:
                assert tile.all()


def test_analyzer_selects_lowest_contribution_layers():
    an = tm.TriangleMixAnalyzer(num_layers=5)
    contributions = [0.9, 0.1, 0.5, 0.05, 0.7]
    for idx, c in enumerate(contributions):
        an.record_middle_qk_gradient(idx, np.float32(c))
        an.record_middle_qk_gradient(idx, np.float32(c * 1.1))
    assert an.get_triangle_layers(2) == [1, 3]
    assert an.get_triangle_layers(3) == [1, 2, 3]
    an.reset()
    # No data -> everything inf, first-k returned.
    assert an.get_triangle_layers(2) == [0, 1]


def test_analyzer_record_from_scores():
    an = tm.TriangleMixAnalyzer(num_layers=2)
    n = 128
    cfg = TriangleMixConfig(enabled=True, num_sink_tokens=4,
                            sliding_window_size=8, num_last_tokens=16)
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(n, n)).astype(np.float32)
    # Layer 0: zero out the middle region -> low contribution.
    middle = np.asarray(tm.middle_mask(n, cfg))
    scores0 = np.where(middle, 0.0, scores)
    an.record_from_scores(0, scores0, cfg)
    an.record_from_scores(1, scores, cfg)
    assert an.get_triangle_layers(1) == [0]
