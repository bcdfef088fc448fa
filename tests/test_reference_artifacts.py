"""Compatibility with the reference repo's actual data artifacts.

The reference snapshot ships its mini split table
(src/data/new_split.npy, 145 frames x 7 paths — SURVEY.md component #27).
Loading it through our split machinery proves on-disk format
interoperability with real reference-prepared data."""

import os
from pathlib import Path

import numpy as np
import pytest

from camradepth_tpu.data.split import (
    ARTIFACT_SUFFIXES,
    load_split,
    rebase_split,
    split_ranges,
)

_REF_SPLIT = Path("/root/reference/src/data/new_split.npy")


@pytest.mark.skipif(not _REF_SPLIT.exists(), reason="reference not mounted")
class TestReferenceSplitFile:
    def test_loads_with_expected_shape(self):
        rows = load_split(_REF_SPLIT)
        assert rows.shape == (145, 7)

    def test_column_order_matches_artifact_contract(self):
        rows = load_split(_REF_SPLIT)
        for col, suffix in enumerate(ARTIFACT_SUFFIXES):
            # every entry of column `col` must end with the expected
            # artifact suffix (dataloader.py:64-96 contract)
            name = str(rows[0][col])
            assert name.endswith(suffix), (col, suffix, name)

    def test_rebase_to_local_dir(self):
        rows = load_split(_REF_SPLIT)
        moved = rebase_split(rows, "/data/prepared")
        assert str(moved[0][0]).startswith("/data/prepared/")
        assert str(moved[0][0]).endswith("_im.jpg")

    def test_mini_split_ranges(self):
        # mini dataset: train_val_split=(0,0) -> everything is test
        rows = load_split(_REF_SPLIT)
        tr, va, te = split_ranges(len(rows), (0, 0))
        assert len(tr) == 0 and len(va) == 0 and len(te) == 145
