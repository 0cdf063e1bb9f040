"""Filesystem shim for manifest TABLE paths (round 8): local POSIX by
default; S3-compatible object storage when the table path carries an
``s3://`` / ``s3a://`` scheme.

The manifest engine's data plane is already storage-agnostic — data
files are written by Spark's parquet writer and read back by
``spark.read.parquet`` (any Hadoop filesystem) or pyarrow (any Arrow
filesystem).  What this module adds is the same property for the
METADATA plane: artifact listing, delta/sidecar JSON, parquet
checkpoints, publish renames, and the put-if-absent version claim all
dispatch on the path scheme.  Local behavior is byte-identical to the
direct ``os`` calls it replaces.

S3 specifics:

* Reads/writes go through ``pyarrow.fs.S3FileSystem`` (bundled with
  pyarrow — no extra dependency).  Endpoint override comes from
  ``SPARK_GRAFT_S3_ENDPOINT`` or ``AWS_ENDPOINT_URL``; credentials
  from the standard AWS env vars.
* ``replace`` maps to ``FileSystem.move`` (copy+delete on S3).  The
  commit protocol only renames ATTEMPT-UNIQUE staging names into
  place before the CAS claim, so the non-atomicity of S3 "rename" is
  harmless — visibility is gated by the claim, exactly the reasoning
  Delta applies on object stores.
* The version CLAIM is an S3 conditional PUT (``If-None-Match: *``,
  the primitive AWS S3 and MinIO both support) implemented with a
  stdlib SigV4 signer — the claim object IS the delta record, landed
  in the table prefix itself, so s3 tables need no side channel (an
  explicit ``set_claim_backend`` still overrides).
* Spark reads S3 under the ``s3a://`` scheme, pyarrow under ``s3://``
  — ``spark_path`` / the internal key mapping translate, so callers
  keep one canonical table path.

fsck, clone, and tail streaming all work on object-store tables
(round 8: a22bf28, 0b0c804).  The one LOCAL-ONLY piece is the legacy
Python-Arrow DataSource writer — s3 tables write through
``write_frame``'s JVM-native path (documented in SCALE.md).
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import os
import shutil
import urllib.error
import urllib.parse
import urllib.request

_REMOTE_SCHEMES = ("s3://", "s3a://")


def is_remote(path: str) -> bool:
    return str(path).startswith(_REMOTE_SCHEMES)


def _endpoint() -> str | None:
    return (os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
            or os.environ.get("AWS_ENDPOINT_URL") or None)


_S3FS = None


def _s3fs():
    """One cached S3FileSystem per process (workers included)."""
    global _S3FS
    if _S3FS is None:
        from pyarrow import fs as pafs

        kwargs: dict = {}
        ep = _endpoint()
        if ep:
            kwargs["endpoint_override"] = ep
            kwargs["allow_bucket_creation"] = False
            # MinIO and most self-hosted endpoints are plain http and
            # region-less; pyarrow still wants A region string
            kwargs.setdefault("region",
                              os.environ.get("AWS_REGION", "us-east-1"))
        _S3FS = pafs.S3FileSystem(**kwargs)
    return _S3FS


def _key(path: str) -> str:
    """``s3[a]://bucket/k/ey`` → ``bucket/k/ey`` (pyarrow's path
    form)."""
    return str(path).split("://", 1)[1]


def spark_path(path: str) -> str:
    """The form Spark's Hadoop readers take: ``s3://`` → ``s3a://``;
    local paths unchanged."""
    p = str(path)
    if p.startswith("s3://"):
        return "s3a://" + p[len("s3://"):]
    return p


def listdir(path: str) -> list[str]:
    """One-level child names (files and 'directories')."""
    if not is_remote(path):
        return os.listdir(path)
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(_key(path), recursive=False,
                            allow_not_found=True)
    return [os.path.basename(i.path.rstrip("/"))
            for i in _s3fs().get_file_info(sel)]


def walk_files(path: str) -> list[str]:
    """Every file under ``path``, as paths RELATIVE to it."""
    if not is_remote(path):
        out = []
        for root, _dirs, names in os.walk(path):
            for n in names:
                out.append(os.path.relpath(os.path.join(root, n), path))
        return out
    from pyarrow import fs as pafs

    base = _key(path).rstrip("/")
    sel = pafs.FileSelector(base, recursive=True, allow_not_found=True)
    return [i.path[len(base) + 1:]
            for i in _s3fs().get_file_info(sel)
            if i.type == pafs.FileType.File]


def _info(path: str):
    return _s3fs().get_file_info(_key(path))


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    from pyarrow import fs as pafs

    return _info(path).type != pafs.FileType.NotFound


def getsize(path: str) -> int:
    if not is_remote(path):
        return os.path.getsize(path)
    info = _info(path)
    if info.size is None:
        raise OSError(f"no such object: {path}")
    return info.size


def getmtime(path: str) -> float:
    if not is_remote(path):
        return os.path.getmtime(path)
    info = _info(path)
    if info.mtime is None:
        raise OSError(f"no such object: {path}")
    return info.mtime.timestamp()


def read_bytes(path: str) -> bytes:
    if not is_remote(path):
        with open(path, "rb") as fh:
            return fh.read()
    try:
        with _s3fs().open_input_stream(_key(path)) as fh:
            return fh.read()
    except FileNotFoundError:
        raise
    except OSError as exc:
        if "404" in str(exc) or "Not Found" in str(exc):
            raise FileNotFoundError(path) from exc
        raise


def read_text(path: str) -> str:
    return read_bytes(path).decode()


def write_bytes(path: str, data: bytes) -> None:
    if not is_remote(path):
        with open(path, "wb") as fh:
            fh.write(data)
        return
    with _s3fs().open_output_stream(_key(path)) as fh:
        fh.write(data)


def write_text(path: str, data: str) -> None:
    """Direct (non-atomic) write — callers that need atomicity write a
    tmp name and ``replace``, or go through ``put_if_absent``."""
    if not is_remote(path):
        with open(path, "w") as fh:
            fh.write(data)
        return
    with _s3fs().open_output_stream(_key(path)) as fh:
        fh.write(data.encode())


def remove(path: str) -> None:
    if not is_remote(path):
        os.remove(path)
        return
    _s3fs().delete_file(_key(path))


def replace(src: str, dst: str) -> None:
    """Local: atomic ``os.replace``.  S3: ``move`` (copy+delete) —
    safe in this protocol because sources are attempt-unique staging
    names and visibility is gated by the CAS claim."""
    if not is_remote(dst):
        os.replace(src, dst)
        return
    _s3fs().move(_key(src), _key(dst))


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)


def rmtree(path: str) -> None:
    if not is_remote(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    try:
        _s3fs().delete_dir(_key(path))
    except OSError:
        pass


def isdir(path: str) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    from pyarrow import fs as pafs

    return _info(path).type == pafs.FileType.Directory


def open_parquet_input(path: str):
    """Something ``pyarrow.parquet`` accepts: the plain path locally,
    an Arrow NativeFile for object storage."""
    if not is_remote(path):
        return path
    return _s3fs().open_input_file(_key(path))


def write_parquet(table, path: str) -> None:
    """``pq.write_table`` to either storage (direct write — used for
    DERIVED artifacts like checkpoints, where a replay reproduces the
    identical bytes)."""
    import pyarrow.parquet as pq

    if not is_remote(path):
        pq.write_table(table, path)
        return
    with _s3fs().open_output_stream(_key(path)) as fh:
        pq.write_table(table, fh)


# --- conditional PUT (the version claim) -----------------------------------

def _sigv4_headers(method: str, url: str, payload: bytes,
                   extra: dict[str, str]) -> dict[str, str]:
    """Minimal AWS Signature V4 for one S3 request (stdlib only —
    boto3 stays an optional dependency).  Public algorithm:
    docs.aws.amazon.com 'Signature Version 4 signing process'."""
    access = os.environ.get("AWS_ACCESS_KEY_ID", "")
    secret = os.environ.get("AWS_SECRET_ACCESS_KEY", "")
    region = os.environ.get("AWS_REGION", "us-east-1")
    token = os.environ.get("AWS_SESSION_TOKEN")
    u = urllib.parse.urlsplit(url)
    host = u.netloc
    now = datetime.datetime.now(datetime.timezone.utc)
    amzdate = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(payload).hexdigest()
    headers = {"host": host, "x-amz-content-sha256": payload_hash,
               "x-amz-date": amzdate}
    if token:
        headers["x-amz-security-token"] = token
    headers.update({k.lower(): v for k, v in extra.items()})
    signed = sorted(headers)
    canonical = "\n".join([
        method, urllib.parse.quote(u.path, safe="/-_.~"), u.query,
        "".join(f"{k}:{headers[k].strip()}\n" for k in signed),
        ";".join(signed), payload_hash])
    scope = f"{datestamp}/{region}/s3/aws4_request"
    to_sign = "\n".join(["AWS4-HMAC-SHA256", amzdate, scope,
                         hashlib.sha256(canonical.encode()).hexdigest()])

    def _h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _h(_h(_h(_h(("AWS4" + secret).encode(), datestamp),
                 region), "s3"), "aws4_request")
    sig = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
    headers["authorization"] = (
        "AWS4-HMAC-SHA256 "
        f"Credential={access}/{scope}, "
        f"SignedHeaders={';'.join(signed)}, Signature={sig}")
    return headers


def put_if_absent(directory: str, name: str, payload: str) -> bool:
    """Atomic put-if-absent of ``{directory}/{name}`` on an
    S3-compatible store via conditional PUT (``If-None-Match: *``) —
    the claim object IS the metadata record, no side channel.  Returns
    False when the name already exists (another writer won)."""
    key = f"{_key(directory).rstrip('/')}/{name}"
    ep = _endpoint()
    if ep:
        url = f"{ep.rstrip('/')}/{urllib.parse.quote(key, safe='/-_.~')}"
    else:
        bucket, _, rest = key.partition("/")
        region = os.environ.get("AWS_REGION", "us-east-1")
        url = (f"https://{bucket}.s3.{region}.amazonaws.com/"
               f"{urllib.parse.quote(rest, safe='/-_.~')}")
    body = payload.encode()
    headers = _sigv4_headers("PUT", url, body, {"If-None-Match": "*"})
    req = urllib.request.Request(url, data=body, method="PUT",
                                 headers=headers)
    try:
        with urllib.request.urlopen(req):
            return True
    except urllib.error.HTTPError as exc:
        if exc.code in (409, 412):
            return False
        raise
