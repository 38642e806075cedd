"""CommitBackend — the object-store-shaped control plane of the
versioned-table commit protocol (VERDICT r10 item #2, S3 port r11
item #3): conditional PUT / compare-and-swap / conditional DELETE,
lease-based liveness with NO pid assumptions off the local fs, and
the TOCTOU-free reclaim all three backends (LocalFS, Memory, S3 via
moto) share through ``VersionedTable._write_lock``. The per-mutation
fence (``mutate_if``) closes the zombie check-to-syscall window on
mutex-backed backends."""

from __future__ import annotations

import os
import threading

import pytest

from nycitibike_data_transform_spark.commit_backend import (
    LocalFSBackend,
    MemoryBackend,
    S3Backend,
)
from nycitibike_data_transform_spark.versioning import (
    ConcurrentWriteError,
    VersionedTable,
)

try:  # optional: the S3 contract tests need boto3 + the moto emulator
    import boto3
    from moto import mock_aws

    _HAVE_MOTO = True
except ImportError:  # pragma: no cover
    _HAVE_MOTO = False

_S3_PARAM = pytest.param(
    "s3", marks=pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
)


@pytest.fixture
def s3_backend_factory():
    """An S3Backend against an in-process moto emulator — the same
    conditional-request semantics (If-None-Match: *, If-Match on PUT
    and DELETE) AWS S3 enforces, minus the network."""
    with mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="spark-graft-commit")

        def make(**kw):
            return S3Backend(
                "spark-graft-commit", prefix="tbl", client=client, **kw
            )

        yield make


_S3LIVE_PARAM = pytest.param(
    "s3live",
    marks=pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent"),
)


@pytest.fixture(params=["local", "memory", _S3_PARAM, "gcs", _S3LIVE_PARAM])
def backend(request, tmp_path):
    """Every backend dialect answers the SAME contract tests: local
    flock, in-memory mutex, S3-via-moto (in-process), S3 over a LIVE
    moto HTTP server (real network serialization), and GCS
    generation-match over the live in-repo emulator (r12 item #4)."""
    if request.param == "local":
        return LocalFSBackend(str(tmp_path / "ctrl"))
    if request.param == "s3":
        factory = request.getfixturevalue("s3_backend_factory")
        return factory()
    if request.param == "gcs":
        return request.getfixturevalue("gcs_backend_factory")()
    if request.param == "s3live":
        return request.getfixturevalue("s3live_backend_factory")()
    return MemoryBackend()


def test_primitive_contract(backend):
    """The five conditionals behave identically on all three backends
    (local fs, in-memory emulation, S3-via-moto) — that identity IS
    the portability claim."""
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


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_lease_expiry_with_skew_margin(s3_backend_factory):
    """S3 leases are WALL-CLOCK expiry with a skew margin (r11 ADVICE:
    monotonic readings from different machines are incomparable): a
    lease reads live through expiry+margin, dead only once every
    plausibly-skewed clock agrees, and the reclaim is the conditional
    delete — identical protocol to MemoryBackend."""
    now = [1_000_000.0]
    b = s3_backend_factory(
        lease_ttl=30.0, clock=lambda: now[0], skew_margin=5.0
    )
    lease = b.new_lease()
    assert b.create_exclusive("_lock", lease)
    assert b.lease_live(lease)

    now[0] += 31.0  # expired, but inside the skew margin: still live
    assert b.lease_live(b.get("_lock"))

    now[0] += 10.0  # past expiry + margin: dead, conditional reclaim
    observed = b.get("_lock")
    assert not b.lease_live(observed)
    assert b.delete_if("_lock", observed)
    assert b.create_exclusive("_lock", b.new_lease())


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_verify_conditional_support(s3_backend_factory):
    """The deploy-time probe passes against a store that ENFORCES
    conditional requests (moto does) and leaves no probe litter."""
    b = s3_backend_factory()
    b.verify_conditional_support()
    assert b.list("_probe/") == []


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_cas_detects_interleaved_writer(s3_backend_factory):
    """The ETag pin makes cas race-free at the STORE: content matches
    at read time, but a writer slips in between our GET and our PUT —
    the If-Match PUT 412s and cas reports False instead of losing the
    interloper's update. (Emulated by mutating through a second handle
    between the read and the conditional write.)"""
    b = s3_backend_factory()
    b.put("_current", "5")

    real_get = b._get_with_etag

    def get_then_lose_race(key):
        content, etag = real_get(key)
        # another writer moves the pointer after our read
        b._s3.put_object(Bucket=b.bucket, Key=b._k(key), Body=b"6")
        return content, etag

    b._get_with_etag = get_then_lose_race
    try:
        assert not b.cas("_current", "5", "7")  # 412, not a lost update
    finally:
        b._get_with_etag = real_get
    assert b.get("_current") == "6"  # the interloper's write survives


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_versioned_table_full_lifecycle_on_s3_backend(
    spark, tmp_path, s3_backend_factory
):
    """The third CommitBackend end-to-end (r11 VERDICT item #3): the
    ENTIRE control plane — lock, pointer, manifests, zone-map sidecar,
    vacuum bookkeeping — lives in an S3 bucket behind real conditional
    requests, while Spark's parquet data plane stays on the local fs.
    Same assertions as the MemoryBackend lifecycle test."""
    b = s3_backend_factory()
    root = str(tmp_path / "s3tbl")
    t = VersionedTable(root, backend=b)

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, x double"
    )
    assert t.write_version(df.repartition(3, "id")) == 1
    assert t.write_version(df.withColumn("x", df.x * 2)) == 2

    # metadata is in the bucket, NOT on disk
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
    got = t.read_range(spark, "x", 35.0, 70.0)
    assert {r["id"] for r in got.collect()} == {2, 3}

    assert t.vacuum(keep=1) == [1]
    assert b.list("_versions/") == ["_versions/v00000002.json"]
    with pytest.raises(ValueError, match="was vacuumed"):
        t.read_version(spark, 1)


def test_mutate_if_is_atomic_on_mutex_backends(tmp_path):
    """The per-mutation fence primitive: fn runs iff the key holds the
    expected content, and on mutex-backed backends the check+fn pair
    excludes every concurrent conditional — a reclaim attempted while
    fn runs waits for fn to finish rather than interleaving."""
    for b in (LocalFSBackend(str(tmp_path / "ctrl")), MemoryBackend()):
        assert b.create_exclusive("_lock", "me")
        ran = []
        assert b.mutate_if("_lock", "me", lambda: ran.append(1))
        assert ran == [1]
        assert not b.mutate_if("_lock", "not-me", lambda: ran.append(2))
        assert ran == [1]  # fn NOT run on content mismatch

        # exclusion: a delete_if racing a slow fn serializes behind it
        inside = threading.Event()
        release = threading.Event()

        def slow_fn():
            inside.set()
            release.wait(timeout=30)

        order = []

        def mutator():
            b.mutate_if("_lock", "me", slow_fn)
            order.append("fn-done")

        def reclaimer():
            inside.wait(timeout=30)
            b.delete_if("_lock", "me")
            order.append("reclaimed")

        th_m, th_r = (
            threading.Thread(target=mutator),
            threading.Thread(target=reclaimer),
        )
        th_m.start()
        th_r.start()
        inside.wait(timeout=30)
        import time as _time

        _time.sleep(0.1)  # give the reclaimer a chance to (wrongly) jump in
        assert order == []  # it is blocked behind the fence
        release.set()
        th_m.join(timeout=30)
        th_r.join(timeout=30)
        assert order == ["fn-done", "reclaimed"]


def test_zombie_stalling_after_lease_check_still_loses(spark, tmp_path):
    """r11 VERDICT item #4 done-bar: a zombie that passes
    `_ensure_lease` and the committed-check, then stalls long enough
    for the winner to reclaim and commit, must STILL lose — the slot
    install itself re-validates the lease atomically (mutate_if), so
    the destructive rmtree/rename never runs. Simulated by disabling
    the zombie's early checks entirely: only the per-mutation fence
    stands between its wake-up and the winner's files."""
    now = [0.0]
    b = MemoryBackend(lease_ttl=30.0, clock=lambda: now[0])
    root = str(tmp_path / "tbl")
    a, w = VersionedTable(root, backend=b), VersionedTable(root, backend=b)

    df_a = spark.createDataFrame([(1, "zombie")], "k int, v string")
    df_w = spark.createDataFrame([(2, "winner")], "k int, v string")

    cm = a._write_lock()
    cm.__enter__()
    try:
        # A passed its checks for v2 and stalls; meanwhile its lease
        # expires and the winner reclaims and commits v1
        now[0] = 31.0
        assert w.write_version(df_w) == 1

        # A wakes with its early fences disabled (the stall happened
        # AFTER they passed) and tries to install a staged tree for v2
        # — above the pointer, so the committed-check would pass too
        a._ensure_lease = lambda: None
        stage = a._attempt_dir()
        os.makedirs(stage)
        with open(os.path.join(stage, "part-zombie.parquet"), "w") as f:
            f.write("x")
        with pytest.raises(ConcurrentWriteError, match="per-mutation fence"):
            a._move_into_slot(stage, 2)

        # the fence refused atomically: nothing was renamed or cleaned
        assert os.path.exists(stage)
        assert not os.path.exists(a._data_dir(2))
    finally:
        cm.__exit__(None, None, None)

    # the winner's commit is intact and readable
    assert w.current_version() == 1
    assert [tuple(r) for r in w.read_current(spark).collect()] == [
        (2, "winner")
    ]


def test_zombie_vacuum_cannot_delete_winners_files(spark, tmp_path):
    """r12 extension of the fence: vacuum's rmtrees — committed data
    dirs, the _staging sweep (exactly where a reclaiming winner is
    staging its next commit), and the above-pointer orphan sweep — run
    under the per-mutation fence, so a zombie vacuum waking
    post-reclaim deletes NO files."""
    now = [0.0]
    b = MemoryBackend(lease_ttl=30.0, clock=lambda: now[0])
    root = str(tmp_path / "tbl")
    a, w = VersionedTable(root, backend=b), VersionedTable(root, backend=b)

    df = spark.createDataFrame([(1, "x")], "k int, v string")
    for i in range(3):
        a.write_version(df)

    cm = a._write_lock()
    cm.__enter__()  # A starts a vacuum and stalls
    try:
        now[0] = 31.0  # lease expires; the winner reclaims the lock
        wcm = w._write_lock()
        wcm.__enter__()
        try:
            # the winner is mid-commit: an in-flight staging attempt
            winner_stage = w._attempt_dir()
            os.makedirs(winner_stage)

            # A wakes with its entry check disabled (the stall came
            # after it passed) — only the per-mutation fence stands
            a._ensure_lease = lambda: None
            with pytest.raises(
                ConcurrentWriteError, match="per-mutation fence"
            ):
                a._vacuum_locked(keep=1)

            # nothing was rmtree'd: all data dirs and the winner's
            # in-flight staging survive
            for v in (1, 2, 3):
                assert os.path.isdir(a._data_dir(v))
            assert os.path.isdir(winner_stage)
            # the documented residual: the zombie's pre-fence manifest
            # delete landed — but only for v1, a version OUTSIDE the
            # keep window of the CURRENT committed state, i.e. a
            # deletion any legitimate lock holder could have made
            assert a._backend.get(a._manifest_key(1)) is None
            assert a._backend.get(a._manifest_key(2)) is not None
        finally:
            wcm.__exit__(None, None, None)
    finally:
        cm.__exit__(None, None, None)

    # a legitimate holder vacuums normally afterwards: v2 is dropped
    # by policy and v1's manifest-less dir goes with the orphan sweep
    assert w.vacuum(keep=1) == [2]
    assert not os.path.isdir(w._data_dir(1))
    assert not os.path.isdir(w._data_dir(2))
    assert os.path.isdir(w._data_dir(3))


def test_local_lease_payloads_are_unique_per_acquisition(tmp_path):
    """r11 ADVICE: LocalFS leases are pid:nonce, so two acquisitions
    by one process are distinguishable (delete_if can't confuse
    incarnations) while liveness still parses the pid."""
    b = LocalFSBackend(str(tmp_path / "ctrl"))
    l1, l2 = b.new_lease(), b.new_lease()
    assert l1 != l2
    assert l1.split(":")[0] == str(os.getpid())
    assert b.lease_live(l1)  # our own pid is alive
    # a dead pid's payload reads dead regardless of the nonce
    import subprocess

    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()
    assert not b.lease_live(f"{proc.pid}:deadbeef")
    # legacy bare-pid payloads still parse
    assert not b.lease_live(str(proc.pid))
    assert b.lease_live("garbage")  # unrecognized: err toward live


_PROC_WORKER = r"""
import sys, time
sys.path.insert(0, sys.argv[1])
from nycitibike_data_transform_spark.commit_backend import LocalFSBackend

root, wid, n, log = sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5]
b = LocalFSBackend(root)
wins = []
i = 0
deadline = time.time() + 20.0
while i < n and time.time() < deadline:
    observed = b.get("ptr")
    new = f"{wid}:{i}"
    if b.cas("ptr", observed, new):
        wins.append(f"{observed}|{new}")
        i += 1
# create_exclusive race: every worker tries the same key once
ce = b.create_exclusive("exclusive", wid)
with open(log, "w") as f:
    f.write("\n".join(wins + [f"CE={int(ce)}"]))
"""


def test_local_cas_linearizes_across_real_processes(tmp_path):
    """Every prior race test emulates concurrency (threads, fake
    clocks, monkeypatched stalls). This one runs real OS processes
    hammering ONE LocalFSBackend key with content-CAS — the commit
    protocol's pointer-swap primitive — and proves linearizability
    from the workers' own logs: the successful (observed -> new)
    transitions form a single unforked chain from the seed value to
    the final content. A fork (two winners from one observed value)
    or a lost update (final content outside the chain) means the
    flock'd read-compare-write is not atomic ACROSS PROCESSES, which
    no in-process test can establish. Also races create_exclusive on
    one key from every process: exactly one may win."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "store")
    from nycitibike_data_transform_spark.commit_backend import LocalFSBackend

    LocalFSBackend(root).put("ptr", "seed")

    n_workers, n_wins = 8, 25
    procs, logs = [], []
    for w in range(n_workers):
        log = str(tmp_path / f"log{w}")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _PROC_WORKER, repo, root,
                 f"w{w}", str(n_wins), log],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    for p in procs:
        assert p.wait(timeout=60) == 0

    transitions: list[tuple[str, str]] = []
    ce_wins = 0
    for log in logs:
        with open(log) as f:
            for line in f.read().splitlines():
                if line.startswith("CE="):
                    ce_wins += int(line[3:])
                elif line:
                    obs, new = line.split("|")
                    transitions.append((obs, new))

    assert len(transitions) >= n_workers  # real contention happened
    preds = [t[0] for t in transitions]
    succs = [t[1] for t in transitions]
    # atomicity: no observed value ever produced two winners, and
    # every written value is unique
    assert len(set(preds)) == len(preds), "forked chain: CAS not atomic"
    assert len(set(succs)) == len(succs)
    # the transitions chain exactly from the seed to the final content
    final = LocalFSBackend(root).get("ptr")
    assert set(preds) - set(succs) == {"seed"}
    assert set(succs) - set(preds) == {final}
    # create_exclusive: one winner across eight real processes
    assert ce_wins == 1


_SPARK_WRITER = r"""
import random, sys, time
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession, functions as F
from nycitibike_data_transform_spark.versioning import (
    ConcurrentWriteError, VersionedTable,
)

repo, root, wid, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-{wid}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
table = VersionedTable(root)
rng = random.Random(wid)
done = 0
deadline = time.time() + 240
while done < n and time.time() < deadline:
    df = spark.range(50).select(
        F.col("id"), F.lit(f"{wid}:{done}").alias("marker")
    )
    try:
        table.write_version(df)
        done += 1
    except ConcurrentWriteError:
        time.sleep(rng.uniform(0.02, 0.15))
sys.exit(0 if done == n else 3)
"""


@pytest.mark.slow  # two full Spark JVMs + a 240 s per-writer commit
# deadline (ADVICE r12: deselectable with -m "not slow" on loaded CI
# boxes, and the deadline doubled from 120 s so a slow-but-correct box
# times out the pytest wait before a writer falsely exits 3)
def test_two_real_spark_writers_interleave_without_lost_updates(spark, tmp_path):
    """Capstone cross-process integration: TWO separate JVMs (each its
    own SparkSession in its own OS process) alternate real
    write_version commits against ONE table root, retrying on
    ConcurrentWriteError — the documented multi-writer pattern. The
    single-writer lease plus pointer CAS must yield a strictly linear
    history with every commit present exactly once and every snapshot
    internally unmixed (a version's rows carry exactly one writer's
    marker — a torn commit would mix two). Thread-based tests cannot
    prove this: flock exclusion and crash-scoped cleanup only show up
    across real process boundaries."""
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from nycitibike_data_transform_spark.versioning import VersionedTable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "warehouse" / "race_table")
    n_each = 4
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SPARK_WRITER, repo, root, w, str(n_each)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for w in ("alpha", "beta")
    ]
    codes = [p.wait(timeout=480) for p in procs]
    assert codes == [0, 0], f"writer exit codes {codes}"

    # verify from a THIRD process's view (the test session)
    table = VersionedTable(root)
    versions = table.versions()
    assert versions == list(range(1, 2 * n_each + 1)), versions
    hist = table.history()
    assert [h["version"] for h in hist] == versions
    markers = []
    for v in versions:
        got = (
            table.read_version(spark, v)
            .select(F.countDistinct("marker").alias("d"),
                    F.min("marker").alias("m"),
                    F.count("*").alias("n"))
            .collect()[0]
        )
        assert (got["d"], got["n"]) == (1, 50), f"torn snapshot at v{v}"
        markers.append(got["m"])
    # every commit from both writers present exactly once, in
    # per-writer monotone order (each writer's own commits are serial)
    assert sorted(markers) == sorted(
        f"{w}:{i}" for w in ("alpha", "beta") for i in range(n_each)
    )
    for w in ("alpha", "beta"):
        seq = [m for m in markers if m.startswith(w)]
        assert seq == [f"{w}:{i}" for i in range(n_each)]


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_large_put_goes_multipart(s3_backend_factory):
    """VERDICT r13 item 3, S3 parity: manifests above the threshold go
    through the documented multipart protocol — parts individually
    retryable, object visible atomically at complete. The multipart
    ETag's '-N' suffix is the store's own witness that N parts landed;
    small control-plane objects keep the plain (suffix-free) ETag."""
    b = s3_backend_factory(
        multipart_threshold=1024 * 1024, part_size=5 * 1024 * 1024
    )
    manifest = "m" * (11 * 1024 * 1024)  # 3 parts: 5 MiB + 5 MiB + 1 MiB
    b.put("_versions/v00000001.json", manifest)
    assert b.get("_versions/v00000001.json") == manifest
    _, etag = b._get_with_etag("_versions/v00000001.json")
    assert etag.rstrip('"').endswith("-3")

    b.put("_current", "7")
    _, etag = b._get_with_etag("_current")
    assert "-" not in etag


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_part_size_below_aws_minimum_refused():
    """AWS rejects sub-5-MiB parts only at the final complete call
    (EntityTooSmall) — the constructor fails fast instead."""
    with pytest.raises(ValueError, match="AWS multipart minimum"):
        S3Backend("bucket", client=object(), part_size=1024)


@pytest.mark.skipif(not _HAVE_MOTO, reason="boto3/moto absent")
def test_s3_failed_multipart_aborts_staged_parts(s3_backend_factory):
    """A part-upload failure must abort the multipart upload (staged
    parts are billed until reclaimed) and leave the key absent — the
    object only ever appears atomically at complete."""
    b = s3_backend_factory(
        multipart_threshold=1024 * 1024, part_size=5 * 1024 * 1024
    )

    class _FailSecondPart:
        def __init__(self, inner):
            self._inner = inner
            self.aborted = 0

        def upload_part(self, **kw):
            if kw["PartNumber"] == 2:
                raise RuntimeError("injected part failure")
            return self._inner.upload_part(**kw)

        def abort_multipart_upload(self, **kw):
            self.aborted += 1
            return self._inner.abort_multipart_upload(**kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    b._s3 = _FailSecondPart(b._s3)
    with pytest.raises(RuntimeError, match="injected part failure"):
        b.put("_versions/v00000002.json", "x" * (11 * 1024 * 1024))
    assert b._s3.aborted == 1
    assert b.get("_versions/v00000002.json") is None
    pending = b._s3.list_multipart_uploads(Bucket=b.bucket).get("Uploads", [])
    assert pending == []
