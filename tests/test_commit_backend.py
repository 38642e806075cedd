"""CommitBackend — the object-store-shaped control plane of the
versioned-table commit protocol (VERDICT r10 item #2): conditional
PUT / compare-and-swap / conditional DELETE, lease-based liveness
with NO pid assumptions in the emulated backend, and the TOCTOU-free
reclaim both backends share through ``VersionedTable._write_lock``."""

from __future__ import annotations

import os
import threading

import pytest

from nycitibike_data_transform_spark.commit_backend import (
    LocalFSBackend,
    MemoryBackend,
)
from nycitibike_data_transform_spark.versioning import (
    ConcurrentWriteError,
    VersionedTable,
)


@pytest.fixture(params=["local", "memory"])
def backend(request, tmp_path):
    if request.param == "local":
        return LocalFSBackend(str(tmp_path / "ctrl"))
    return MemoryBackend()


def test_primitive_contract(backend):
    """The five conditionals behave identically on both backends —
    that identity IS the portability claim."""
    # create_exclusive: first wins, second fails, content intact
    assert backend.create_exclusive("k", "a")
    assert not backend.create_exclusive("k", "b")
    assert backend.get("k") == "a"

    # cas: wrong expectation fails, right one swaps, None = create
    assert not backend.cas("k", "wrong", "c")
    assert backend.cas("k", "a", "c")
    assert backend.get("k") == "c"
    assert not backend.cas("new", "x", "v")  # expected content, absent key
    assert backend.cas("new", None, "v")  # conditional create
    assert not backend.cas("new", None, "v2")  # exists now

    # delete_if: wrong content fails and leaves the key, right removes
    assert not backend.delete_if("k", "a")
    assert backend.get("k") == "c"
    assert backend.delete_if("k", "c")
    assert backend.get("k") is None
    assert not backend.delete_if("k", "c")  # already gone

    # list / put / delete
    backend.put("d/one", "1")
    backend.put("d/two", "2")
    assert backend.list("d/") == ["d/one", "d/two"]
    backend.delete("d/one")
    backend.delete("d/one")  # idempotent
    assert backend.list("d/") == ["d/two"]


def test_local_create_exclusive_is_atomic_with_content(tmp_path):
    """The lock can never be observed half-written: creation is a
    hardlink of a fully-written temp file, so a concurrent reader sees
    the whole lease or no lock at all — the torn-read reclaim hazard
    of O_EXCL-then-write is structurally gone."""
    b = LocalFSBackend(str(tmp_path / "ctrl"))
    assert b.create_exclusive("_lock", "12345")
    assert b.get("_lock") == "12345"
    # no .ce. temp litter left behind
    assert not [f for f in os.listdir(b.root) if ".ce." in f]


def test_memory_lease_expiry_reclaim_no_pids(tmp_path):
    """Object stores have no pids: liveness is lease EXPIRY. An
    unexpired lease blocks a second writer; an expired one is
    reclaimed via the conditional delete and the table commits
    normally — the exact semantics DEPLOY.md specifies for the
    S3/GCS port."""
    now = [0.0]
    b = MemoryBackend(lease_ttl=30.0, clock=lambda: now[0])

    lease = b.new_lease()
    assert b.create_exclusive("_lock", lease)
    assert b.lease_live(lease)

    # a second writer inside the lease window must NOT reclaim
    other = b.new_lease()
    assert not b.create_exclusive("_lock", other)
    assert b.lease_live(b.get("_lock"))

    # past expiry the lease reads dead and the conditional reclaim wins
    now[0] = 31.0
    observed = b.get("_lock")
    assert not b.lease_live(observed)
    assert b.delete_if("_lock", observed)
    assert b.create_exclusive("_lock", b.new_lease())


def test_two_emulated_concurrent_commits_one_winner(tmp_path):
    """VERDICT r10 item #2 done-bar: two concurrent commit attempts
    through the emulated conditional-PUT backend produce exactly one
    winner and one ConcurrentWriteError — no pid liveness anywhere
    (the MemoryBackend lease is an expiry timestamp)."""
    b = MemoryBackend(lease_ttl=60.0)
    t = VersionedTable(str(tmp_path / "tbl"), backend=b)
    entered = threading.Event()
    release = threading.Event()
    outcomes: dict[str, object] = {}

    def winner():
        with t._write_lock():
            entered.set()
            release.wait(timeout=30)
        outcomes["winner"] = "committed"

    def loser():
        entered.wait(timeout=30)
        try:
            with t._write_lock():
                outcomes["loser"] = "committed"
        except ConcurrentWriteError:
            outcomes["loser"] = "refused"

    th_w, th_l = threading.Thread(target=winner), threading.Thread(target=loser)
    th_w.start()
    th_l.start()
    th_l.join(timeout=60)
    release.set()
    th_w.join(timeout=60)
    assert outcomes == {"winner": "committed", "loser": "refused"}
    assert b.get("_lock") is None  # released


def test_versioned_table_full_lifecycle_on_memory_backend(spark, tmp_path):
    """The ENTIRE control plane (pointer, manifests, sidecar, vacuum
    bookkeeping) runs through the backend: a table whose metadata
    lives only in memory — no _current, no _versions/ on disk —
    commits, time-travels, zone-map-prunes, and vacuums exactly like
    the local default. This is the object-store port, minus the
    network."""
    b = MemoryBackend()
    root = str(tmp_path / "memtbl")
    t = VersionedTable(root, backend=b)

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, x double"
    )
    assert t.write_version(df.repartition(3, "id")) == 1
    assert t.write_version(df.withColumn("x", df.x * 2)) == 2

    # metadata is in the backend, NOT on disk
    assert not os.path.exists(os.path.join(root, "_current"))
    assert not os.path.exists(os.path.join(root, "_versions"))
    assert b.get("_current") == "2"
    assert b.list("_versions/") == [
        "_versions/v00000001.json",
        "_versions/v00000002.json",
    ]

    assert t.current_version() == 2 and t.versions() == [1, 2]
    assert {r["x"] for r in t.read_version(spark, 1).collect()} == {
        10.0, 20.0, 30.0,
    }
    # zone-map read path (manifest commit-time stats) works unchanged
    got = t.read_range(spark, "x", 35.0, 70.0)
    assert {r["id"] for r in got.collect()} == {2, 3}

    # vacuum removes backend metadata and local data together
    assert t.vacuum(keep=1) == [1]
    assert b.list("_versions/") == ["_versions/v00000002.json"]
    with pytest.raises(ValueError, match="was vacuumed"):
        t.read_version(spark, 1)


def test_pointer_cas_rejects_zombie_commit(spark, tmp_path):
    """The pointer swap is a compare-and-swap from the version this
    writer started from: if the pointer moved underneath (a reclaimed
    lease let another writer commit), the zombie's commit FAILS
    loudly instead of silently clobbering the winner."""
    t = VersionedTable(str(tmp_path / "zombie"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t.write_version(df)
    # simulate the winner having advanced the pointer mid-commit
    assert t._backend.cas("_current", "1", "7")
    with pytest.raises(ConcurrentWriteError, match="pointer"):
        t._commit_pointer(1, 2)


def test_zombie_writer_aborts_before_touching_winner(spark, tmp_path):
    """r11 review: a writer whose lease EXPIRES mid-commit (the slow-
    Spark-write shape) must abort before its destructive steps — the
    pre-clean rmtree of the shared version slot and the manifest put —
    not merely fail the final pointer CAS after clobbering the
    winner's committed manifest. With a fake clock: A acquires, its
    lease expires, B reclaims and commits version N; A's resumed
    commit raises ConcurrentWriteError at the lease fence and B's
    snapshot survives byte-identical."""
    now = [0.0]
    b = MemoryBackend(lease_ttl=30.0, clock=lambda: now[0])
    root = str(tmp_path / "tbl")
    a, t2 = VersionedTable(root, backend=b), VersionedTable(root, backend=b)

    df_a = spark.createDataFrame([(1, "zombie")], "k int, v string")
    df_b = spark.createDataFrame([(2, "winner")], "k int, v string")

    cm = a._write_lock()
    cm.__enter__()  # A holds the lease and starts its long "write"
    try:
        now[0] = 31.0  # lease expires mid-write
        assert t2.write_version(df_b) == 1  # B reclaims and commits v1

        # A resumes: the fence fires BEFORE rmtree/manifest-put
        with pytest.raises(ConcurrentWriteError, match="reclaimed"):
            a._write_version_locked(df_a)
    finally:
        cm.__exit__(None, None, None)

    # the winner's commit is intact — data, manifest, pointer
    assert t2.current_version() == 1
    assert [tuple(r) for r in t2.read_current(spark).collect()] == [
        (2, "winner")
    ]
    # and A can commit normally after re-acquiring a fresh lease
    assert a.write_version(df_a) == 2


def test_dead_writer_tmp_litter_is_swept(tmp_path):
    """A writer killed between creating its unique temp file and the
    link/rename that consumes it leaves `*.ce.PID.hex` / `*.tmp.PID.hex`
    litter; the next conditional op sweeps dead-pid leftovers (live
    pids untouched)."""
    import subprocess

    b = LocalFSBackend(str(tmp_path / "ctrl"))
    os.makedirs(b.root, exist_ok=True)
    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()
    dead = os.path.join(b.root, f"_lock.ce.{proc.pid}.deadbeef")
    live = os.path.join(b.root, f"_lock.ce.{os.getpid()}.ab12cd34")
    tmp_dead = os.path.join(b.root, f"_current.tmp.{proc.pid}.00ff00ff")
    for p in (dead, live, tmp_dead):
        with open(p, "w") as f:
            f.write("x")

    assert b.create_exclusive("_lock", "me")
    assert not os.path.exists(dead)  # dead-pid .ce litter swept
    assert not os.path.exists(tmp_dead)  # dead-pid .tmp litter swept
    assert os.path.exists(live)  # live writer's in-flight temp kept
    os.unlink(live)


def test_manifest_commit_is_conditional(spark, tmp_path):
    """r11 review follow-up: the manifest slot is created with
    if-none-match semantics. A zombie that stalls AFTER its lease
    re-check and wakes to find the winner's version committed fails
    the conditional create (winner's manifest untouched); a manifest
    orphaned by a CRASHED attempt at an uncommitted slot is replaced
    under the held lock."""
    import json as _json

    t = VersionedTable(str(tmp_path / "cond"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t.write_version(df)

    # committed slot: the conditional put refuses to touch it
    committed = t._backend.get(t._manifest_key(1))
    with pytest.raises(ConcurrentWriteError, match="committed by"):
        t._put_manifest(1, "{}")
    assert t._backend.get(t._manifest_key(1)) == committed  # untouched

    # uncommitted slot with a crashed attempt's orphan: replaced
    t._backend.put(t._manifest_key(2), '{"orphan": true}')
    with t._write_lock():
        t._put_manifest(2, '{"fresh": true}')
    assert _json.loads(t._backend.get(t._manifest_key(2))) == {"fresh": True}
    t._backend.delete(t._manifest_key(2))

    # and a normal second commit still works end-to-end
    assert t.write_version(df) == 2
