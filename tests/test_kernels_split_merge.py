"""Split/merge kernels vs the reference's parameter tables
(reference: tests/common/test_models_recognition.py:20-120)."""

import numpy as np
import pytest

from onnxtr_spark.kernels.split_merge import merge_multi_strings, merge_strings, remap_preds, split_crops


@pytest.mark.parametrize(
    "crops, max_ratio, target_ratio, overlap, num_crops",
    [
        ([np.zeros((32, 128, 3), dtype=np.uint8)], 8, 4, 0.5, 1),  # no split
        ([np.zeros((32, 1024, 3), dtype=np.uint8)], 8, 6, 0.5, 10),  # split
    ],
)
def test_split_crops_counts(crops, max_ratio, target_ratio, overlap, num_crops):
    new_crops, crop_map, should_remap = split_crops(crops, max_ratio, target_ratio, overlap)
    assert len(new_crops) == num_crops
    assert len(crop_map) == len(crops)
    assert should_remap == (len(crops) != len(new_crops))


@pytest.mark.parametrize(
    "inputs, max_ratio, target_ratio, overlap, expected_remap, expected_len, expected_shape, expected_crop_map",
    [
        ([np.zeros((32, 32 * 4, 3))], 4, 4, 0.5, False, 1, (32, 128, 3), 0),
        ([np.zeros((32, 32 * 4 + 1, 3))], 4, 4, 0.5, True, 2, (32, 128, 3), (0, 2, 0.9921875)),
        ([np.zeros((32, 32 * 8, 3))], 8, 4, 0.5, False, 1, (32, 256, 3), 0),
        ([np.zeros((32, 128 + 64, 3))], 4, 4, 0.5, True, 2, (32, 128, 3), (0, 2, 0.5)),
        ([np.zeros((32, 128 + 64, 3))], 2, 4, 0.5, True, 2, (32, 128, 3), (0, 2, 0.5)),
        ([np.zeros((32, 128 + 32, 3))], 4, 4, 0.5, True, 2, (32, 128, 3), (0, 2, 0.75)),
        ([np.zeros((32, 128 + 128, 3))], 4, 4, 0.5, True, 3, (32, 128, 3), (0, 3, 0.5)),
        ([np.zeros((32, 128 + 64 + 32, 3))], 4, 4, 0.5, True, 3, (32, 128, 3), (0, 3, 0.75)),
        ([np.zeros((32, 192 * 2, 3))], 4, 6, 0.5, True, 3, (32, 192, 3), (0, 3, 0.5)),
        ([np.empty((1, 0, 3))], -1, 4, 0.5, False, 1, (1, 0, 3), 0),  # empty-split fallback
    ],
)
def test_split_crops_cases(inputs, max_ratio, target_ratio, overlap, expected_remap, expected_len, expected_shape, expected_crop_map):
    new_crops, crop_map, remap_required = split_crops(inputs, max_ratio, target_ratio, overlap)
    assert remap_required == expected_remap
    assert len(new_crops) == expected_len
    assert len(crop_map) == 1
    assert crop_map[0] == expected_crop_map
    for crop in new_crops:
        assert crop.shape == expected_shape


@pytest.mark.parametrize("bad_overlap", [0.0, 1.0, -0.5, 1.5])
def test_split_overlap_validation(bad_overlap):
    with pytest.raises(ValueError):
        split_crops([np.zeros((32, 128, 3))], 8, 4, bad_overlap)


@pytest.mark.parametrize(
    "preds, crop_map, overlap, expected",
    [
        ([("hello", 0.5)], [0], 0.5, [("hello", 0.5)]),
        ([("hellowo", 0.5), ("loworld", 0.6)], [(0, 2, 0.5)], 0.5, [("helloworld", 0.55)]),
    ],
)
def test_remap_preds(preds, crop_map, overlap, expected):
    out = remap_preds(preds, crop_map, overlap)
    assert out == expected
    assert all(isinstance(p[0], str) and isinstance(p[1], float) for p in out)


@pytest.mark.parametrize(
    "a, b, ratio, merged",
    [
        # Expected values are the reference *code*'s actual outputs
        # (onnxtr/models/recognition/utils.py:12-66 run with a Hamming
        # shim); its docstring examples are stale docTR leftovers.
        ("abcd", "cdefgh", 0.5, "abcefgh"),
        ("abcdi", "cdefgh", 0.5, "abcdefgh"),
        ("hellowo", "loworld", 0.5, "helloworld"),
        ("abc", "bcdef", 0.5, "abcdef"),
        ("", "abc", 0.5, "abc"),
        ("abc", "", 0.5, "abc"),
    ],
)
def test_merge_strings(a, b, ratio, merged):
    assert merge_strings(a, b, ratio) == merged


def test_merge_multi_strings():
    # Actual reference-code outputs (docstring at utils.py:81-84 is stale).
    assert merge_multi_strings(["abc", "bcdef", "difghi", "aijkl"], 0.5, 0.1) == "abcdefghiaijkl"
    assert merge_multi_strings(["hellowo", "loworld"], 0.5, 0.5) == "helloworld"
    assert merge_multi_strings([], 0.5, 0.5) == ""
