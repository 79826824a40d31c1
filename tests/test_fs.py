"""Storage-agnostic commit protocol: the same write/read/delete
roundtrips, addressed through a URI scheme (file://) so every path
operation exercises the Hadoop FileSystem branch of PathOps instead of
os/shutil — the local stand-in for s3a://gs:// deployment."""

import numpy as np
import pytest

from cloud_volume_spark.fs import PathOps, is_local, local_part
from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.volume import Volume


def test_path_classification():
    assert is_local("/tmp/x")
    assert is_local("relative/x")
    assert not is_local("s3a://bucket/x")
    assert not is_local("file:///tmp/x")  # URI: routed through Hadoop FS
    assert local_part("file:///tmp/x") == "/tmp/x"
    assert local_part("/tmp/x") == "/tmp/x"
    assert local_part("s3a://bucket/x") is None
    # file:// takes the JVM branch; scheme-less takes the os/shutil one
    assert PathOps("/tmp/x")._local == "/tmp/x"


def test_pathops_hadoop_branch(spark, tmp_path):
    base = f"file://{tmp_path}/h"
    ops = PathOps(base, spark)
    # Provably on the JVM branch: the local fast path is disabled and
    # the Hadoop FileSystem object is the one answering the calls.
    assert ops._local is None
    assert "LocalFileSystem" in ops._fs.getClass().getName()
    ops.makedirs(f"{base}/d1")
    assert ops.exists(f"{base}/d1")
    ops.write_bytes(f"{base}/d1/f.bin", b"\x00\x01payload")
    assert ops.read_bytes(f"{base}/d1/f.bin") == b"\x00\x01payload"
    assert ops.listdir(f"{base}/d1") == ["f.bin"]
    ops.rename(f"{base}/d1", f"{base}/d2")
    assert not ops.exists(f"{base}/d1") and ops.exists(f"{base}/d2")
    ops.rmtree(f"{base}/d2")
    assert not ops.exists(f"{base}/d2")
    assert ops.listdir(f"{base}/missing") == []


def test_pathops_hadoop_commit_primitives(spark, tmp_path):
    """The commit protocol's lock + publish primitives under a file://
    PathOps: the PUBLIC primitives route to POSIX O_EXCL / hard-link
    (LocalFileSystem's create(overwrite=false) is a TOCTOU, not a CAS),
    while the GENERIC JVM primitives — the exact code that runs on
    hdfs/s3a/gs — are driven explicitly so the production path has
    real test execution."""
    base = f"file://{tmp_path}/prim"
    ops = PathOps(base, spark)
    assert ops._local is None
    assert ops.atomic_create is True  # POSIX primitives on file://
    ops.makedirs(base)
    # create_exclusive: first writer wins, second loses, remove resets
    assert ops.create_exclusive(f"{base}/_lock") is True
    assert ops.create_exclusive(f"{base}/_lock") is False
    ops.remove(f"{base}/_lock")
    assert ops.create_exclusive(f"{base}/_lock") is True
    # create_with_content: CAS publish — loser keeps the winner's bytes
    assert ops.create_with_content(f"{base}/_manifest-1.json", b"gen1") is True
    assert ops.create_with_content(f"{base}/_manifest-1.json", b"nope") is False
    assert ops.read_bytes(f"{base}/_manifest-1.json") == b"gen1"
    ops.remove(f"{base}/missing-ok")  # no-op delete
    # sync'd write (hsync-capable or not, must not raise)
    ops.write_bytes(f"{base}/synced.bin", b"durable", sync=True)
    assert ops.read_bytes(f"{base}/synced.bin") == b"durable"

    # the generic-store (hdfs/s3a) primitives, executed through the
    # Hadoop FileSystem for real — same first-wins contract
    assert ops._jvm_create_exclusive(f"{base}/_jlock") is True
    assert ops._jvm_create_exclusive(f"{base}/_jlock") is False
    assert ops._jvm_create_with_content(f"{base}/_jman.json", b"g1") is True
    assert ops._jvm_create_with_content(f"{base}/_jman.json", b"x") is False
    assert ops.read_bytes(f"{base}/_jman.json") == b"g1"
    # and the close-decides variant (conditional-create stores)
    ops._close_decides = True
    assert ops._jvm_create_exclusive(f"{base}/_clock") is True
    assert ops._jvm_create_exclusive(f"{base}/_clock") is False
    assert ops._jvm_create_with_content(f"{base}/_cman.json", b"g2") is True
    ops._close_decides = False


def test_pathops_file_uri_without_session_degrades_to_local(
        tmp_path, monkeypatch):
    """VolumeInfo.load('file:///...') before any SparkSession exists
    must not fail: with no active session, file:// degrades to the
    os/shutil branch (semantically identical on the local FS); truly
    remote schemes still require a session."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(lambda: None))
    ops = PathOps(f"file://{tmp_path}/x")
    assert ops._local == f"{tmp_path}/x"
    ops.makedirs(f"file://{tmp_path}/x")
    ops.write_bytes(f"file://{tmp_path}/x/a.bin", b"hi")
    assert ops.read_bytes(f"file://{tmp_path}/x/a.bin") == b"hi"
    with pytest.raises(RuntimeError, match="SparkSession"):
        PathOps("s3a://bucket/x")


@pytest.fixture()
def uri_vol(spark, rng, tmp_path):
    arr = rng.integers(0, 255, size=(128, 64, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, f"file://{tmp_path}/urivol", chunk_size=(64, 64, 64)
    )
    return vol, arr


def test_uri_write_read_roundtrip(uri_vol):
    vol, arr = uri_vol
    out = vol.cutout(Bbox((0, 0, 0), (128, 64, 64)))
    assert np.array_equal(out, arr)
    # unaligned cutout exercises the Spark scan fallback too
    out = vol.cutout(Bbox((10, 5, 3), (100, 60, 50)))
    assert np.array_equal(out, arr[10:100, 5:60, 3:50, :])


def test_uri_open_and_overwrite(spark, uri_vol, rng):
    vol, arr = uri_vol
    reopened = Volume.open(spark, vol.base_path)
    patch = rng.integers(0, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    reopened.upload(patch, offset=(64, 0, 0))
    arr[64:, :, :, :] = patch
    out = reopened.cutout(Bbox((0, 0, 0), (128, 64, 64)))
    assert np.array_equal(out, arr)


def test_uri_delete(uri_vol):
    vol, _ = uri_vol
    vol.delete(Bbox((0, 0, 0), (64, 64, 64)))
    ex = vol.exists(Bbox((0, 0, 0), (128, 64, 64)))
    assert not ex[(0, 0, 0)] and ex[(1, 0, 0)]
    vol.delete_all()
    assert not vol.has_data(0)


def test_volume_open_follows_redirect_and_is_read_only(spark, rng, tmp_path):
    arr = rng.integers(0, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    real = Volume.from_numpy(
        spark, arr, str(tmp_path / "real"), chunk_size=(64, 64, 64)
    )
    alias_info = real.info.clone()
    alias_info.info["redirect"] = str(tmp_path / "real")
    alias_info.commit(str(tmp_path / "alias"))
    vol = Volume.open(spark, str(tmp_path / "alias"))
    assert vol.base_path == str(tmp_path / "real")
    out = vol.cutout(Bbox((0, 0, 0), (64, 64, 64)))
    assert np.array_equal(out, arr)
    with pytest.raises(PermissionError):
        vol.upload(arr, offset=(0, 0, 0))


class _NonAtomicOps:
    """A PathOps stand-in emulating an object store WITHOUT atomic
    create-if-absent: create_with_content is exists-check-then-PUT,
    with an injectable racer firing between our PUT and the caller's
    read-back — the exact S3-without-conditional-writes window."""

    atomic_create = False

    def __init__(self, inner):
        self._inner = inner
        self.after_put = None

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def create_with_content(self, path, data):
        if self._inner.exists(path):
            return False
        self._inner.write_bytes(path, data)  # plain overwriting PUT
        if self.after_put is not None:
            hook, self.after_put = self.after_put, None
            hook(path)
        return True


def test_nonatomic_store_lost_publish_is_loud(spark, rng, tmp_path):
    """On a store whose create-if-absent is NOT atomic, a publisher
    whose manifest PUT gets overwritten by a racer must fail loudly
    (read-back verification in _publish_manifest), never return
    success for a commit that is no longer the published one."""
    import json

    from cloud_volume_spark.volume import CommitConflictError

    arr = rng.integers(0, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "na"), chunk_size=(32, 32, 32))
    real = vol._fs
    fake = _NonAtomicOps(real)
    vol._fs = fake

    def racer_overwrites(path):
        man = json.loads(real.read_bytes(path).decode())
        man["entries"] = {}  # the racer's competing commit
        real.write_bytes(path, json.dumps(man).encode())

    fake.after_put = racer_overwrites
    with pytest.raises(CommitConflictError, match="overwritten"):
        vol.upload(
            np.zeros((32, 32, 32, 1), np.uint8), offset=(0, 0, 0))

    # without a racer the same volume commits fine through the fake
    vol.upload(np.zeros((32, 32, 32, 1), np.uint8), offset=(0, 0, 0))
    out = vol.cutout(Bbox((0, 0, 0), (32, 32, 32)))
    assert (out == 0).all()

def test_lost_race_classifier():
    """Only exists/precondition signatures mean 'lost the race'; IO,
    auth, and throttle failures must NOT be mistaken for contention."""
    race = [
        Exception("org.apache.hadoop.fs.FileAlreadyExistsException: x"),
        Exception("RemoteFileChangedException: precondition on close"),
        Exception("Service: Amazon S3; Status Code: 412; If-None-Match"),
        Exception("hdfs AlreadyBeingCreatedException lease held"),
    ]
    not_race = [
        Exception("java.net.SocketTimeoutException: read timed out"),
        Exception("Status Code: 503; Slow Down"),
        Exception("AccessDeniedException: 403 Forbidden"),
        Exception("Connection reset by peer"),
    ]
    for e in race:
        assert PathOps._is_lost_race(e), e
    for e in not_race:
        assert not PathOps._is_lost_race(e), e


class _JClass:
    def __init__(self, name):
        self._name = name

    def getName(self):
        return self._name


class _JThrowable:
    """Py4J-shaped Java throwable: class name + message + cause."""

    def __init__(self, cls_name, message="", cause=None, status=None):
        self._cls, self._msg, self._cause = cls_name, message, cause
        self._status = status

    def getClass(self):
        return _JClass(self._cls)

    def getMessage(self):
        return self._msg

    def getCause(self):
        return self._cause

    def statusCode(self):
        if self._status is None:
            raise AttributeError("no status")
        return self._status


class _JError(Exception):
    def __init__(self, jexc):
        super().__init__("py4j wrapped")
        self.java_exception = jexc


def test_lost_race_java_classification():
    """Java exceptions classify by exact class name over the cause
    chain — a genuine IO failure whose MESSAGE merely mentions a race
    marker must propagate (the r8 verdict's false-positive direction),
    while a marker class buried in the cause chain still reads as a
    lost race."""
    # false-positive direction: message echoes markers, class is IO
    echoed = _JError(_JThrowable(
        "java.io.IOException",
        "proxy said: PreconditionFailed / "
        "FileAlreadyExistsException while uploading"))
    assert not PathOps._is_lost_race(echoed)
    # ...even when the echo sits in a nested cause's message
    nested_echo = _JError(_JThrowable(
        "java.io.IOException", "upload failed",
        cause=_JThrowable(
            "java.net.SocketTimeoutException",
            "retry trace mentioned RemoteFileChangedException")))
    assert not PathOps._is_lost_race(nested_echo)

    # true positives: exact class, top-level or via the cause chain
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "org.apache.hadoop.fs.FileAlreadyExistsException", "exists")))
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "java.io.IOException", "create failed",
        cause=_JThrowable(
            "org.apache.hadoop.fs.s3a.RemoteFileChangedException",
            "precondition"))))
    # structured 412 status on the exception itself
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "software.amazon.awssdk.services.s3.model.S3Exception",
        "At least one precondition failed", status=412)))
    # raw-SDK message-templated 412 (AWS format string, own frame only)
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "com.amazonaws.services.s3.model.AmazonS3Exception",
        "If-None-Match (Service: Amazon S3; Status Code: 412)")))
    # a 503 throttle never reads as a race, even with a cause chain
    assert not PathOps._is_lost_race(_JError(_JThrowable(
        "java.io.IOException", "throttled",
        cause=_JThrowable(
            "software.amazon.awssdk.services.s3.model.S3Exception",
            "Slow Down (Service: S3; Status Code: 503)", status=503))))
    # unreadable cause chain breaks the walk without raising
    class _Broken(_JThrowable):
        def getCause(self):
            raise RuntimeError("gateway gone")
    assert not PathOps._is_lost_race(_JError(_Broken(
        "java.io.IOException", "hmm")))


def test_jvm_create_exclusive_propagates_genuine_failures(spark, tmp_path):
    """On a conditional-create store, a transient create() failure must
    propagate — reporting it as 'lock held' sends operators hunting a
    lock file that does not exist."""
    base = f"file://{tmp_path}/cls"
    ops = PathOps(base, spark)
    ops._close_decides = True

    class _Throttled:
        def create(self, p, overwrite):
            raise Exception("Status Code: 503; throttled; Slow Down")

    class _Lost:
        def create(self, p, overwrite):
            raise Exception("FileAlreadyExistsException: racer won")

    ops._fs = _Throttled()
    with pytest.raises(Exception, match="503"):
        ops._jvm_create_exclusive(f"{base}/_lk")
    with pytest.raises(Exception, match="503"):
        ops._jvm_create_with_content(f"{base}/_m.json", b"x")
    ops._fs = _Lost()
    assert ops._jvm_create_exclusive(f"{base}/_lk") is False
    assert ops._jvm_create_with_content(f"{base}/_m.json", b"x") is False


def test_nonatomic_readback_failure_is_not_a_conflict(spark, rng, tmp_path):
    """A transient READ error during the non-atomic store's post-publish
    verification must not claim the manifest was overwritten: the commit
    durably published, and a blind retry would then hit a spurious
    generation collision. It surfaces as ManifestError naming the
    read-back, and the published manifest is intact."""
    from cloud_volume_spark.volume import ManifestError

    arr = rng.integers(0, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "rb"), chunk_size=(32, 32, 32))
    real = vol._fs
    fake = _NonAtomicOps(real)
    vol._fs = fake

    failing = {}

    def start_failing(path):
        failing["path"] = path

    def read_bytes(path):
        if path == failing.get("path"):
            raise IOError("Status Code: 503; Slow Down")
        return real.read_bytes(path)

    fake.read_bytes = read_bytes
    fake.after_put = start_failing
    with pytest.raises(ManifestError, match="read-back"):
        vol.upload(np.zeros((32, 32, 32, 1), np.uint8), offset=(0, 0, 0))

    # the publish itself landed: a fresh handle serves the new commit
    vol2 = Volume.open(spark, str(tmp_path / "rb"))
    out = vol2.cutout(Bbox((0, 0, 0), (32, 32, 32)))
    assert (out == 0).all()


def test_posix_publish_tmp_is_invisible_to_file_sources(
        tmp_path, monkeypatch):
    """The hard-link publish writes its tmp under a DOT-prefixed name
    in the same directory: Spark file sources (the streaming change
    feed readStreams the feed dir) skip '.'-prefixed files, so an
    in-flight or crash-orphaned tmp can never be ingested as feed rows
    or crash a listed-then-gone micro-batch."""
    import os as _os

    seen = []
    real_link = _os.link

    def spy(src, dst, *a, **k):
        seen.append(src)
        return real_link(src, dst, *a, **k)

    monkeypatch.setattr(_os, "link", spy)
    ops = PathOps(str(tmp_path))
    assert ops.create_with_content(f"{tmp_path}/gen-1.json", b"rows") is True
    assert seen and all(
        _os.path.basename(s).startswith(".") for s in seen)
    # no residue: the only visible entry is the published file
    assert sorted(_os.listdir(tmp_path)) == ["gen-1.json"]


def test_jvm_publish_via_rename(spark, tmp_path):
    """The HDFS-like publish path (write dot-tmp, atomic rename): the
    destination is never visible before its content lands (a streaming
    file source that lists an empty file marks it processed and never
    re-reads it), the loser of a publish race keeps the winner's
    bytes, and no tmp residue survives either outcome."""
    base = f"file://{tmp_path}/ren"
    ops = PathOps(base, spark)
    ops.makedirs(base)
    assert ops._jvm_publish_via_rename(f"{base}/gen-1.json", b"g1") is True
    assert ops.read_bytes(f"{base}/gen-1.json") == b"g1"
    # second publisher loses and must not clobber the winner
    assert ops._jvm_publish_via_rename(f"{base}/gen-1.json", b"XX") is False
    assert ops.read_bytes(f"{base}/gen-1.json") == b"g1"
    assert ops.listdir(base) == ["gen-1.json"]  # no tmp residue


def test_commit_primitives_cross_process_atomicity(tmp_path):
    """The POSIX commit primitives under REAL multi-process contention
    (the existing stress test races threads in one interpreter; the
    production failure mode is separate writer processes): for each
    round, exactly one of 8 processes wins create_exclusive, and
    exactly one wins create_with_content with the published bytes being
    the winner's — never a torn mix."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    rounds = 20

    def worker(wid, out):
        ops = PathOps(str(tmp_path))
        wins = []
        for r in range(rounds):
            lock_won = ops.create_exclusive(f"{tmp_path}/lock-{r}")
            pub_won = ops.create_with_content(
                f"{tmp_path}/man-{r}.json",
                f"writer-{wid}".encode())
            wins.append((r, bool(lock_won), bool(pub_won)))
        out.put((wid, wins))

    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(w, q)) for w in range(8)]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    for r in range(rounds):
        lock_winners = [wid for wid, wins in results
                        if any(rr == r and lw for rr, lw, _ in wins)]
        pub_winners = [wid for wid, wins in results
                       if any(rr == r and pw for rr, _, pw in wins)]
        assert len(lock_winners) == 1, (r, lock_winners)
        assert len(pub_winners) == 1, (r, pub_winners)
        content = open(tmp_path / f"man-{r}.json", "rb").read()
        assert content == f"writer-{pub_winners[0]}".encode()


def test_lost_race_gcs_and_service_message_shapes():
    """Storage-service rejections that surface the 412 differently —
    GCS StorageException.getCode(), precondition wording in a
    service-exception message — still classify as lost races, while
    the same wording on an IOException frame propagates."""
    class _GThrowable(_JThrowable):
        # only getCode answers — the inherited statusCode/getStatusCode
        # must NOT shadow it, or this test would pass with the getCode
        # probe deleted
        def statusCode(self):
            raise AttributeError("no statusCode")

        def getStatusCode(self):
            raise AttributeError("no getStatusCode")

        def getCode(self):
            if self._status is None:
                raise AttributeError("no code")
            return self._status

    # google-cloud-storage shape: getCode()==412
    g = _GThrowable("com.google.cloud.storage.StorageException",
                    "412 Precondition Failed")
    g._status = 412
    assert PathOps._is_lost_race(_JError(g))
    # precondition wording on a service-exception class counts...
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "com.google.cloud.storage.StorageException",
        "412 Precondition Failed")))
    assert PathOps._is_lost_race(_JError(_JThrowable(
        "shaded.example.ObjectStorageServiceException",
        "conditionNotMet")))
    # ...the same words on an IO frame do NOT (the ADVICE FP direction)
    assert not PathOps._is_lost_race(_JError(_JThrowable(
        "java.io.IOException", "proxy replied: 412 Precondition Failed")))
    # a 503 StorageException is not a race
    s = _GThrowable("com.google.cloud.storage.StorageException",
                    "Service Unavailable")
    s._status = 503
    assert not PathOps._is_lost_race(_JError(s))
