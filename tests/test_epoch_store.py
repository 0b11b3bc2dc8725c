"""epoch_store.plan_fold unit laws (no Spark): retry targeting,
stale-epoch refusal, gap tolerance, compaction interplay."""

import pytest

from amazon_personalize_connectors_spark.streaming.epoch_store import (
    commit_version,
    current_version,
    plan_fold,
    read_meta,
)


def _store(tmp_path):
    p = tmp_path / "store"
    p.mkdir()
    return str(p)


def test_first_fold_and_advance(tmp_path):
    s = _store(tmp_path)
    assert plan_fold(s, 0) == (0, None, {"epoch": None, "prev": None,
                                         "last_epoch": None})
    commit_version(s, 0, 0, None, 0)
    assert current_version(s) == 0
    v, prior, _ = plan_fold(s, 1)
    assert (v, prior) == (1, 0)
    commit_version(s, 1, 1, 0, 1)
    # gaps are legal (empty micro-batches consume epochs)
    v, prior, _ = plan_fold(s, 5)
    assert (v, prior) == (2, 1)


def test_retry_after_flip_reuses_same_version_and_prior(tmp_path):
    s = _store(tmp_path)
    commit_version(s, 0, 0, None, 0)
    commit_version(s, 1, 1, 0, 1)
    v, prior, _ = plan_fold(s, 1)  # replay of the committed epoch
    assert (v, prior) == (1, 0)


def test_stale_epoch_refused(tmp_path):
    s = _store(tmp_path)
    commit_version(s, 0, 0, None, 0)
    commit_version(s, 1, 1, 0, 1)
    with pytest.raises(ValueError, match="behind the store"):
        plan_fold(s, 0)


def test_retry_onto_compaction_refused(tmp_path):
    s = _store(tmp_path)
    commit_version(s, 0, 0, None, 0)
    commit_version(s, 1, 1, 0, 1)
    # compaction: non-epoch version, last_epoch carried forward
    commit_version(s, 2, None, 1, 1)
    assert read_meta(s, 2)["epoch"] is None
    # the NEXT epoch folds cleanly on top of the compacted version
    v, prior, _ = plan_fold(s, 2)
    assert (v, prior) == (3, 2)
    # but a RETRY of the folded-in epoch is an operator error
    with pytest.raises(ValueError, match="compaction"):
        plan_fold(s, 1)


def test_legacy_store_without_meta_advances(tmp_path):
    s = _store(tmp_path)
    (tmp_path / "store" / "v0").mkdir()
    (tmp_path / "store" / "_VERSION").write_text("0")
    v, prior, meta = plan_fold(s, 7)
    assert (v, prior) == (1, 0) and meta["last_epoch"] is None
