"""Tests for inclusive_segments (reference: src/utils.rs semantics)."""

from norma_tpu.utils import segments_list


def pred(x):
    return x >= 10


def test_empty():
    assert segments_list([], pred) == []


def test_no_match():
    assert segments_list([1, 2, 3], pred) == []


def test_single_match_dropped():
    # One boundary only -> no complete segment (reference drops the tail).
    assert segments_list([1, 10, 2], pred) == []


def test_basic_pair():
    assert segments_list([10, 1, 2, 11], pred) == [[10, 1, 2, 11]]


def test_leading_dropped():
    assert segments_list([1, 2, 10, 3, 11], pred) == [[10, 3, 11]]


def test_non_overlapping_boundaries():
    # Boundaries are consumed: [10,1,11] then restart after 11 -> [12,2,13].
    assert segments_list([10, 1, 11, 12, 2, 13], pred) == [[10, 1, 11], [12, 2, 13]]


def test_adjacent_boundaries():
    assert segments_list([10, 11, 12, 13], pred) == [[10, 11], [12, 13]]


def test_trailing_incomplete_dropped():
    assert segments_list([10, 1, 11, 12, 2], pred) == [[10, 1, 11]]


def test_all_match_even():
    assert segments_list([10, 11], pred) == [[10, 11]]
