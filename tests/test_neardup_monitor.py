"""Streaming incremental MinHash-LSH near-dup monitor
(streaming/neardup_monitor.py): the union of per-epoch candidate
pairs must equal the batch minhash_lsh_candidates over everything
drained, replays must not double-count, and stale epochs are refused.
"""

import os

import pytest

from amazon_personalize_connectors_spark.functions.dedup import (
    minhash_lsh_candidates,
)
from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
    apply_neardup_batch,
    candidates_from_store,
    maintain_from_stream,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "another completely different text about ducks"),
    (6, "completely different text about spark engines today"),
]


def _snap(df):
    return {
        (r["id_a"], r["id_b"]): r["n_shared_bands"] for r in df.collect()
    }


def test_stream_neardup_equals_batch(spark, tmp_path):
    store = str(tmp_path / "nd")
    os.makedirs(store, exist_ok=True)
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    apply_neardup_batch(b0, 0, store)
    apply_neardup_batch(b1, 1, store)
    want = _snap(
        minhash_lsh_candidates(
            spark.createDataFrame(DOCS, "doc_id long, text string")
        )
    )
    got = _snap(candidates_from_store(spark, store))
    assert got == want and len(want) >= 2
    # hard retry: replay the last epoch AFTER its pointer flip
    apply_neardup_batch(b1, 1, store)
    assert _snap(candidates_from_store(spark, store)) == want
    # a fresh checkpoint (epoch restarting at 0) is refused
    with pytest.raises(ValueError, match="behind the store"):
        apply_neardup_batch(b0, 0, store)


def test_stream_neardup_via_real_stream(spark, tmp_path):
    """End-to-end through Structured Streaming: file source, two
    files, maxFilesPerTrigger=1, AvailableNow."""
    import json

    landing = tmp_path / "docs"
    landing.mkdir()
    for i, chunk in enumerate((DOCS[:3], DOCS[3:])):
        (landing / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"doc_id": d, "text": t}) for d, t in chunk
            )
        )
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(landing))
    store = str(tmp_path / "nd2")
    maintain_from_stream(stream, store, str(tmp_path / "ckpt"))
    want = _snap(
        minhash_lsh_candidates(
            spark.createDataFrame(DOCS, "doc_id long, text string")
        )
    )
    assert _snap(candidates_from_store(spark, store)) == want


def test_compact_store_preserves_candidates(spark, tmp_path):
    from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
        compact_store,
    )

    store = str(tmp_path / "nd3")
    os.makedirs(store, exist_ok=True)
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    apply_neardup_batch(b0, 0, store)
    apply_neardup_batch(b1, 1, store)
    before = _snap(candidates_from_store(spark, store))
    compact_store(spark, store)
    # grace-window pruning (ADVICE r8): the pre-flip reader's
    # reachable set (v0, v1) SURVIVES the compaction — and the
    # live-chain read means the survivors are never double-read;
    # explicit gc_store collapses to the compacted version
    from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
        gc_store,
    )

    vdirs = sorted(d for d in os.listdir(store) if d.startswith("v"))
    assert vdirs == ["v0", "v1", "v2"]
    assert _snap(candidates_from_store(spark, store)) == before
    gc_store(store)
    vdirs = sorted(d for d in os.listdir(store) if d.startswith("v"))
    assert vdirs == ["v2"]
    assert _snap(candidates_from_store(spark, store)) == before
    # folds keep working after compaction (next epoch past the
    # compacted version)
    b2 = spark.createDataFrame(
        [(7, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    apply_neardup_batch(b2, 3, store)
    after = _snap(candidates_from_store(spark, store))
    assert set(before).issubset(after) and len(after) > len(before)


def test_live_versions_keeps_legacy_meta_less_dirs(spark, tmp_path):
    """Code-review r9: a version dir with NO _META.json sidecar is a
    LEGACY fold delta, not a compaction — the live-chain walk must
    keep walking past it (treating it as a compaction would truncate
    state reads and let the pruner delete live deltas)."""
    import os as _os

    from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
        _live_versions,
        apply_neardup_batch,
        candidates_from_store,
    )

    store = str(tmp_path / "nd_legacy")
    _os.makedirs(store, exist_ok=True)
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    apply_neardup_batch(b0, 0, store)
    apply_neardup_batch(b1, 1, store)
    full = {
        (r["id_a"], r["id_b"])
        for r in candidates_from_store(spark, store).collect()
    }
    # simulate a legacy store: strip v0's sidecar
    _os.remove(_os.path.join(store, "v0", "_META.json"))
    assert _live_versions(store, 1) == [0, 1]
    got = {
        (r["id_a"], r["id_b"])
        for r in candidates_from_store(spark, store).collect()
    }
    assert got == full and len(got) > 0


def test_fresh_checkpoint_refused_even_at_epoch_zero(spark, tmp_path):
    """Code-review r9: the epoch heuristic alone cannot distinguish a
    RETRY of epoch 0 from a FRESH checkpoint's epoch 0 (a one-batch
    AvailableNow drain leaves last_epoch=0, and the fresh run's epoch
    0 carries different data) — the checkpoint-identity token closes
    the hole: a drain from a different checkpoint must be refused, not
    silently folded as a retry."""
    import json as _json

    landing = tmp_path / "docs_tok"
    landing.mkdir()
    (landing / "b0.json").write_text(
        "\n".join(
            _json.dumps({"doc_id": d, "text": t}) for d, t in DOCS[:3]
        )
    )
    store = str(tmp_path / "nd_tok")
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(landing)
    )
    maintain_from_stream(stream, store, str(tmp_path / "ckptA"))
    before = _snap(candidates_from_store(spark, store))

    # different checkpoint, different data, epoch 0 again
    landing2 = tmp_path / "docs_tok2"
    landing2.mkdir()
    (landing2 / "b0.json").write_text(
        "\n".join(
            _json.dumps({"doc_id": d + 100, "text": t}) for d, t in DOCS[3:]
        )
    )
    stream2 = spark.readStream.schema("doc_id long, text string").json(
        str(landing2)
    )
    with pytest.raises(Exception, match="does not own the store"):
        maintain_from_stream(stream2, store, str(tmp_path / "ckptB"))
    # state untouched by the refused drain
    assert _snap(candidates_from_store(spark, store)) == before

    # the ORIGINAL checkpoint may keep draining (same token)
    (landing / "b1.json").write_text(
        "\n".join(
            _json.dumps({"doc_id": d, "text": t}) for d, t in DOCS[3:]
        )
    )
    stream3 = spark.readStream.schema("doc_id long, text string").json(
        str(landing)
    )
    maintain_from_stream(stream3, store, str(tmp_path / "ckptA"))
    assert len(_snap(candidates_from_store(spark, store))) >= len(before)


def test_missing_live_dir_fails_loudly(spark, tmp_path):
    """ADVICE r9: state reads used to exists-filter, so a mistaken
    gc/prune that removed a live bands/pairs dir silently DROPPED
    near-dup state (undercounted candidates). Live-chain dirs are
    load-bearing: a missing one must raise, not skip."""
    import shutil

    store = str(tmp_path / "nd_req")
    os.makedirs(store, exist_ok=True)
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    apply_neardup_batch(b0, 0, store)
    apply_neardup_batch(b1, 1, store)
    # simulate the mistaken prune of a LIVE delta dir
    shutil.rmtree(os.path.join(store, "v0", "pairs"))
    with pytest.raises(ValueError, match="missing required pairs"):
        candidates_from_store(spark, store)
    shutil.rmtree(os.path.join(store, "v0", "bands"))
    b2 = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="missing required bands"):
        apply_neardup_batch(b2, 2, store)
