"""Auto remat policy (VERDICT r4 #4): model.remat="auto" resolves to the
least rematerialization that fits HBM next to the train state and the
device-resident dataset cache."""

from __future__ import annotations

from chess_vision_tpu.models import build_model, normalize_remat, resolve_remat

GB = 2**30


def test_normalize_remat_string_spellings():
    # --set model.remat=... reaches build_model as a raw string
    assert normalize_remat("false") is False
    assert normalize_remat("False") is False
    assert normalize_remat("0") is False
    assert normalize_remat("true") is True
    assert normalize_remat("full") is True
    assert normalize_remat("attn_out") == "attn_out"
    assert normalize_remat("auto") == "auto"
    assert normalize_remat(True) is True
    assert normalize_remat(False) is False


def test_resolve_no_cache_prefers_noremat():
    # measured fit points: noremat b<=512 runs on a 16 GB chip w/o cache
    assert resolve_remat(256, 0.0, hbm_bytes=16 * GB) is False
    assert resolve_remat(512, 0.0, hbm_bytes=16 * GB) is False


def test_resolve_small_cache_still_noremat():
    # ~5.4 GB cache (55k ycbcr420 images) + b=256 noremat fits
    assert resolve_remat(256, 5.4 * GB, hbm_bytes=16 * GB) is False


def test_resolve_big_cache_full_remat():
    # the r4 regime: 12 GB corpus cache forces full remat at b=256
    assert resolve_remat(256, 12 * GB, hbm_bytes=16 * GB) is True


def test_resolve_middle_tier_attn_out():
    # enough room for the per-block attention outputs but not full noremat
    r = resolve_remat(256, 9 * GB, hbm_bytes=16 * GB)
    assert r == "attn_out"


def test_resolve_monotone_in_cache_and_batch():
    order = {False: 0, "attn_out": 1, True: 2}
    prev = -1
    for cache_gb in (0, 2, 4, 6, 8, 10, 12, 14):
        r = order[resolve_remat(256, cache_gb * GB, hbm_bytes=16 * GB)]
        assert r >= prev
        prev = r
    prev = -1
    for b in (32, 64, 128, 256, 512, 1024, 2048):
        r = order[resolve_remat(b, 6 * GB, hbm_bytes=16 * GB)]
        assert r >= prev
        prev = r


def test_build_model_string_false_not_truthy():
    cfg = {"model": {"arch": "vit", "input_size": 64, "remat": "false"},
           "training": {"mixed_precision": True}}
    assert build_model(cfg).remat is False


def test_build_model_auto_defaults_safe():
    # entry points that never resolve "auto" must get full remat
    cfg = {"model": {"arch": "vit", "input_size": 64},
           "training": {"mixed_precision": True}}
    assert build_model(cfg).remat is True
