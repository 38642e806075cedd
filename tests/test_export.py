"""export_corpus: shards must be disjoint/exhaustive, internally
ordered by shuffle position, byte-stable across runs, and the
manifest must account for every doc."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest

from nycitibike_data_transform_spark.catalog import load_table
from nycitibike_data_transform_spark.operators.export import export_corpus


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "documents")


def _read_shards(out_dir):
    """shard_id -> list of JSON rows, files in name order (one file
    per shard is also asserted here)."""
    shards = {}
    for d in sorted(glob.glob(f"{out_dir}/data/shard_id=*")):
        sid = int(d.rsplit("=", 1)[1])
        files = sorted(
            f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")
        )
        assert len(files) == 1, f"shard {sid}: expected one file, got {files}"
        rows = []
        with open(files[0]) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
        shards[sid] = rows
    return shards


def test_export_round_trip_and_order(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    manifest = export_corpus(docs, out, seed="t", n_shards=8)
    shards = _read_shards(out)

    # disjoint + exhaustive over the corpus
    all_ids = [r["doc_id"] for rows in shards.values() for r in rows]
    assert sorted(all_ids) == sorted(r["doc_id"] for r in docs.collect())
    assert len(all_ids) == len(set(all_ids))

    # every shard file is internally ordered by shuffle position, and
    # positions are round-robin consistent with the shard id
    for sid, rows in shards.items():
        pos = [r["shuffle_pos"] for r in rows]
        assert pos == sorted(pos)
        assert all((p - 1) % 8 == sid for p in pos)

    # global positions are a permutation of 1..n
    assert sorted(r["shuffle_pos"] for rows in shards.values() for r in rows) == list(
        range(1, len(all_ids) + 1)
    )

    # manifest accounts for every doc and matches the files
    assert sum(m["n_docs"] for m in manifest) == len(all_ids)
    by_sid = {m["shard_id"]: m for m in manifest}
    for sid, rows in shards.items():
        assert by_sid[sid]["n_docs"] == len(rows)
        assert by_sid[sid]["first_pos"] == rows[0]["shuffle_pos"]
        assert by_sid[sid]["last_pos"] == rows[-1]["shuffle_pos"]
    # manifest dir written and readable
    mrows = []
    for f in glob.glob(f"{out}/_manifest/part-*"):
        if f.endswith(".crc"):
            continue
        with open(f) as fh:
            mrows.extend(json.loads(line) for line in fh if line.strip())
    assert sorted(m["shard_id"] for m in mrows) == sorted(shards.keys())


def test_export_is_byte_deterministic(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_corpus(docs, a, seed="s", n_shards=4)
    # second run from a differently-partitioned input frame
    export_corpus(docs.repartition(13), b, seed="s", n_shards=4)

    def digest(out):
        h = {}
        for d in sorted(glob.glob(f"{out}/data/shard_id=*")):
            sid = int(d.rsplit("=", 1)[1])
            (f,) = [
                p for p in sorted(glob.glob(f"{d}/part-*")) if not p.endswith(".crc")
            ]
            with open(f, "rb") as fh:
                h[sid] = hashlib.md5(fh.read()).hexdigest()
        return h

    assert digest(a) == digest(b)


def test_export_seed_changes_layout(spark, docs, tmp_path):
    a, b = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_corpus(docs, a, seed="s1", n_shards=4)
    export_corpus(docs, b, seed="s2", n_shards=4)
    ids = lambda out: {
        sid: [r["doc_id"] for r in rows] for sid, rows in _read_shards(out).items()
    }
    assert ids(a) != ids(b)
