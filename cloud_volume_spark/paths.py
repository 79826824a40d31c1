"""Cloudpath grammar — ``FORMAT://PROTOCOL://BUCKET/PATH``.

Re-derivation of the reference's path handling
(``cloudvolume/paths.py``: ``pop_protocol`` :48, ``extract_format_protocol``
:62, ``extract`` :120, ``strict_extract`` :105, ``ascloudpath`` :41) so a
user can hand this engine the exact strings they hand CloudVolume:

    precomputed://gs://bucket/dataset/layer
    gs://bucket/dataset/layer            (format defaults to precomputed)
    graphene://https://example.com/segmentation/1.0/testvol
    zarr://s3://bucket/dataset/layer
    file:///tmp/dataset/layer

The Spark-first part is :func:`to_spark_path`: the PROTOCOL maps to the
Hadoop-FileSystem scheme Spark actually reads — ``s3`` becomes ``s3a``
(the Hadoop S3 client; the legacy ``s3://`` blockstore scheme is long
removed), ``file`` becomes a plain local path (PathOps' no-JVM fast
path), ``gs``/``hdfs``/``s3a``/``abfs(s)``/``wasb(s)`` pass through to
their Hadoop connectors, and service protocols with no filesystem
semantics (``http(s)``, ``mem``, ``middleauth+https``) raise a precise
error instead of a deep Hadoop stack trace.
"""

from __future__ import annotations

import os
import posixpath
import re
from collections import namedtuple

ExtractedPath = namedtuple(
    "ExtractedPath",
    ("format", "protocol", "bucket", "basepath", "no_bucket_basepath",
     "dataset", "layer"),
)

ALLOWED_FORMATS = (
    "precomputed", "graphene", "boss", "n5", "zarr", "zarr2", "zarr3",
)

# cloud/file protocols the reference accepts, plus the Hadoop-native
# schemes Spark users already hold (s3a/hdfs/abfs/wasb)
ALLOWED_PROTOCOLS = (
    "gs", "s3", "s3a", "file", "http", "https", "hdfs", "mem",
    "middleauth+https", "matrix", "tigerdata", "abfs", "abfss",
    "wasb", "wasbs",
)

# protocol → Hadoop scheme Spark reads; None = plain local path;
# absent = no filesystem semantics (service protocol)
_SPARK_SCHEMES = {
    "file": None,
    "gs": "gs",
    "s3": "s3a",
    "s3a": "s3a",
    "matrix": "s3a",     # princeton S3 endpoint; bucket config supplies it
    "tigerdata": "s3a",
    "hdfs": "hdfs",
    "abfs": "abfs",
    "abfss": "abfss",
    "wasb": "wasb",
    "wasbs": "wasbs",
}

_PROTOCOL_RE = re.compile(r"(\w+(?:\+\w+)?)://")
_BUCKET_RE = re.compile(r"^(/?[~\d\w_\.\-]+(?::\d+)?)(?:\b|$)")


class UnsupportedProtocolError(ValueError):
    """Cloudpath does not conform to FORMAT://PROTOCOL://BUCKET/PATH
    (reference ``exceptions.UnsupportedProtocolError``)."""


def _error(cloudpath: str) -> UnsupportedProtocolError:
    return UnsupportedProtocolError(
        "Cloud path must conform to FORMAT://PROTOCOL://BUCKET/PATH, "
        "e.g. precomputed://gs://bucket/em, gs://bucket/em, "
        "graphene://https://example.com/image/em. "
        f"Supported formats: {', '.join(ALLOWED_FORMATS)} "
        "(none means precomputed); supported protocols: "
        f"{', '.join(ALLOWED_PROTOCOLS)}. Received: {cloudpath!r}"
    )


def pop_protocol(cloudpath: str):
    """Strip one leading ``proto://`` token; (proto | None, rest)."""
    m = _PROTOCOL_RE.match(cloudpath)
    if not m:
        return None, cloudpath
    return m.group(1), _PROTOCOL_RE.sub("", cloudpath, count=1)


def extract_format_protocol(cloudpath: str):
    """(format, protocol, rest) with the reference's exact error rules:
    no protocol at all, ``gs://gs://``, and ``gs://graphene://`` (format
    after protocol) all raise."""
    proto, rest = pop_protocol(cloudpath)
    if proto is None:
        raise _error(cloudpath)

    fmt, protocol = None, None
    if proto in ALLOWED_PROTOCOLS:
        fmt, protocol = "precomputed", proto
    elif proto in ALLOWED_FORMATS:
        fmt = proto
    else:
        raise _error(cloudpath)

    proto, rest = pop_protocol(rest)
    if proto is not None:
        if proto in ALLOWED_FORMATS:
            raise _error(cloudpath)  # e.g. gs://graphene://
        if proto in ALLOWED_PROTOCOLS:
            if protocol is not None:
                raise _error(cloudpath)  # e.g. gs://gs://
            protocol = proto
        else:
            raise _error(cloudpath)
        extra, rest = pop_protocol(rest)
        if extra is not None:
            raise _error(cloudpath)  # e.g. gs://gs://gs://

    if protocol is None:
        raise _error(cloudpath)
    return fmt, protocol, rest


def extract(cloudpath: str) -> ExtractedPath:
    """Parse into (format, protocol, bucket, basepath,
    no_bucket_basepath, dataset, layer) with the reference's
    decomposition: the last two path segments are dataset/layer; a
    single segment serves as both bucket and layer."""
    if len(cloudpath) == 0:
        return ExtractedPath("", "", "", "", "", "", "")

    fmt, protocol, rest = extract_format_protocol(cloudpath)

    if protocol == "file":
        rest = os.path.abspath(os.path.expanduser(rest))

    m = _BUCKET_RE.match(rest)
    if not m:
        raise _error(cloudpath)
    bucket = m.group(1)

    split = rest.strip("/").split("/")
    if len(split) == 1:
        dataset, layer = bucket, split[0]
        basepath = ""
        no_bucket = ""
    else:
        dataset, layer = split[-2:]
        basepath = "/".join(split[:-1])
        if rest.startswith("/"):
            basepath = "/" + basepath
        no_bucket = "/".join(split[1:-1])
    return ExtractedPath(
        fmt, protocol, bucket, basepath, no_bucket, dataset, layer)


def strict_extract(cloudpath: str) -> ExtractedPath:
    """reference ``strict_extract``: dataset and layer must be set."""
    p = extract(cloudpath)
    if p.dataset == "" or p.layer == "":
        raise _error(cloudpath)
    return p


def ascloudpath(p: ExtractedPath) -> str:
    return "{}://{}://{}".format(
        p.format, p.protocol, posixpath.join(p.basepath, p.layer))


def to_spark_path(cloudpath_or_extracted) -> str:
    """The path Spark/PathOps reads for a cloudpath: protocol mapped to
    its Hadoop scheme (``s3``→``s3a``), ``file`` to a plain local path.
    Service protocols without filesystem semantics raise."""
    p = cloudpath_or_extracted
    if isinstance(p, str):
        fmt, protocol, rest = extract_format_protocol(p)
    else:
        protocol = p.protocol
        rest = posixpath.join(p.basepath, p.layer)
    if protocol not in _SPARK_SCHEMES:
        raise UnsupportedProtocolError(
            f"protocol {protocol!r} has no filesystem semantics Spark "
            "can read (http(s)/mem layers are service-backed); copy the "
            "layer to gs/s3/hdfs/file storage or use the importers"
        )
    scheme = _SPARK_SCHEMES[protocol]
    if scheme is None:
        return os.path.abspath(os.path.expanduser(rest))
    return f"{scheme}://{rest.lstrip('/')}"


def require_local(path: str, operation: str) -> str:
    """The foreign-format importers list source files DRIVER-side
    (``os.listdir``/``open``); handed a remote scheme they would
    silently see an empty listing and import nothing. Returns the
    plain local directory, or raises precisely. (Shares the one
    file://-stripping implementation, ``fs.local_part``.)"""
    from cloud_volume_spark.fs import local_part

    local = local_part(path)
    if local is None:
        raise UnsupportedProtocolError(
            f"{operation} lists source files driver-side and currently "
            f"requires a local or file:// path; got {path!r}. Copy or "
            "mount the remote source first (chunk-table volumes on "
            "gs/s3a/hdfs read natively through Spark)"
        )
    return os.path.abspath(os.path.expanduser(local))


def resolve_cloudpath(path: str, formats=("precomputed",)) -> str:
    """Accept either a plain path (returned unchanged) or a cloudpath
    whose FORMAT is in ``formats``; returns the Spark-readable path.
    This is the shim the openers (``Volume.open``, the zarr/n5
    importers) call so reference-style strings just work."""
    if "://" not in path:
        return path
    fmt, protocol, rest = extract_format_protocol(path)
    if fmt not in formats:
        raise UnsupportedProtocolError(
            f"cloudpath {path!r} declares format {fmt!r}; this opener "
            f"handles {', '.join(formats)} (use the matching "
            "importer/opener for other formats)"
        )
    return to_spark_path(path)
