"""Near-dup verify rework (round 2): outputs pinned to round-1 goldens.

The round-1 implementation verified candidates against a DRIVER-SIDE
id→text map (a full-corpus read — fatal at 100 TB). Round 2 replaced it
with broadcast-id-set → semi-join filter → bucketed co-group verify.
These goldens (captured from the round-1 code at sf0.001) pin that the
rework changed the execution shape, not the answer.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_ray.pipelines.dedup import minhash_near_dup, ngram_jaccard_pairs

GOLDEN_DIR = "/root/repo/tests/goldens"


def _canon(obj) -> pd.DataFrame:
    df = obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("path", ["broadcast", "cogrouped"])
@pytest.mark.parametrize(
    "name,fn", [("minhash_near_dup", minhash_near_dup), ("ngram_jaccard_pairs", ngram_jaccard_pairs)]
)
def test_near_dup_matches_round1_golden(name, fn, path, sf_dir, monkeypatch):
    # both verify paths — the small-candidate broadcast crossover and the
    # scale-path bucketed co-group — must produce identical, golden-pinned rows
    from pdf_extractor_ray.pipelines import dedup as dedup_mod

    if path == "cogrouped":
        monkeypatch.setattr(dedup_mod, "BROADCAST_PAIRS_THRESHOLD", 0)
    got = _canon(fn(sf_dir))
    want = _canon(pd.read_parquet(f"{GOLDEN_DIR}/{name}_sf0.001.parquet"))
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)
