"""Minimal in-process S3-compatible server (stdlib only) — the test
double for object-store manifest tables where no MinIO is available.

Implements exactly the request subset pyarrow's S3FileSystem and the
engine's SigV4 conditional-PUT claim issue: GET (with Range) / HEAD /
PUT (including ``If-None-Match: *`` and ``x-amz-copy-source``) /
DELETE, ListObjectsV2 (prefix + delimiter), bulk DeleteObjects, and
multipart upload.  Signatures are accepted, never validated — this
fakes the STORE, not IAM.  Single bucket namespace: keys are
``bucket/key`` paths.
"""

from __future__ import annotations

import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_TS = "2024-01-01T00:00:00.000Z"


class _State:
    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.lock = threading.Lock()
        self.seq = 0


def _xml(body: str) -> bytes:
    return ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    state: _State = None  # injected

    def log_message(self, *a):  # quiet
        pass

    # -- helpers ---------------------------------------------------------
    def _key(self) -> str:
        return urllib.parse.unquote(
            urllib.parse.urlsplit(self.path).path.lstrip("/"))

    def _query(self) -> dict:
        q = urllib.parse.urlsplit(self.path).query
        return dict(urllib.parse.parse_qsl(q, keep_blank_values=True))

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0) or 0)
        return self.rfile.read(n) if n else b""

    def _send(self, code: int, body: bytes = b"",
              headers: dict | None = None) -> None:
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _404(self):
        self._send(404, _xml("<Error><Code>NoSuchKey</Code></Error>"),
                   {"Content-Type": "application/xml"})

    # -- verbs -----------------------------------------------------------
    def do_HEAD(self):
        # HEAD advertises the object size in Content-Length with NO
        # body (what pyarrow's HeadObject reads the size from)
        key = self._key()
        with self.state.lock:
            data = self.state.objects.get(key)
        if data is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "binary/octet-stream")
        self.send_header("ETag", '"x"')
        self.send_header("Last-Modified",
                         "Mon, 01 Jan 2024 00:00:00 GMT")
        self.send_header("Accept-Ranges", "bytes")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()

    def do_GET(self):
        q = self._query()
        key = self._key()
        if "list-type" in q or key.endswith("/") or "/" not in key \
                or key in ("",):
            if "list-type" in q or key.count("/") == 0:
                self._list(q, bucket=key.split("/")[0] if key else "")
                return
        with self.state.lock:
            data = self.state.objects.get(key)
        if data is None:
            # maybe a list request on a bucket root with prefix
            if "prefix" in q or "list-type" in q:
                self._list(q, bucket=key.split("/")[0])
                return
            self._404()
            return
        rng = self.headers.get("Range")
        if rng:
            m = re.fullmatch(r"bytes=(\d+)-(\d*)", rng.strip())
            lo = int(m.group(1))
            hi = int(m.group(2)) if m.group(2) else len(data) - 1
            hi = min(hi, len(data) - 1)
            part = data[lo:hi + 1]
            self._send(206, part, {
                "Content-Range": f"bytes {lo}-{hi}/{len(data)}",
                "ETag": '"x"', "Accept-Ranges": "bytes",
                "Last-Modified": "Mon, 01 Jan 2024 00:00:00 GMT"})
            return
        self._send(200, data, {"ETag": '"x"', "Accept-Ranges": "bytes",
                               "Last-Modified":
                               "Mon, 01 Jan 2024 00:00:00 GMT"})

    def _list(self, q: dict, bucket: str):
        prefix = q.get("prefix", "")
        delim = q.get("delimiter", "")
        full_prefix = f"{bucket}/{prefix}" if bucket else prefix
        with self.state.lock:
            keys = sorted(k for k in self.state.objects
                          if k.startswith(full_prefix))
        contents, prefixes = [], []
        seen = set()
        for k in keys:
            rest = k[len(full_prefix):]
            if delim and delim in rest:
                p = full_prefix + rest.split(delim)[0] + delim
                if p not in seen:
                    seen.add(p)
                    rel = p[len(bucket) + 1:] if bucket else p
                    prefixes.append(
                        f"<CommonPrefixes><Prefix>{rel}</Prefix>"
                        "</CommonPrefixes>")
            else:
                rel = k[len(bucket) + 1:] if bucket else k
                with self.state.lock:
                    size = len(self.state.objects[k])
                contents.append(
                    f"<Contents><Key>{rel}</Key><Size>{size}</Size>"
                    f"<LastModified>{_TS}</LastModified>"
                    '<ETag>"x"</ETag>'
                    "<StorageClass>STANDARD</StorageClass></Contents>")
        body = _xml(
            "<ListBucketResult>"
            f"<Name>{bucket}</Name><Prefix>{prefix}</Prefix>"
            f"<KeyCount>{len(contents) + len(prefixes)}</KeyCount>"
            "<IsTruncated>false</IsTruncated>"
            + "".join(contents) + "".join(prefixes)
            + "</ListBucketResult>")
        self._send(200, body, {"Content-Type": "application/xml"})

    def do_PUT(self):
        key = self._key()
        q = self._query()
        body = self._body()
        if "partNumber" in q and "uploadId" in q:
            with self.state.lock:
                self.state.uploads.setdefault(
                    q["uploadId"], {})[int(q["partNumber"])] = body
            self._send(200, b"", {"ETag": f'"{q["partNumber"]}"'})
            return
        src = self.headers.get("x-amz-copy-source")
        if src:
            src_key = urllib.parse.unquote(src.lstrip("/"))
            with self.state.lock:
                data = self.state.objects.get(src_key)
                if data is None:
                    self._404()
                    return
                self.state.objects[key] = data
            self._send(200, _xml(
                "<CopyObjectResult><ETag>\"x\"</ETag>"
                f"<LastModified>{_TS}</LastModified>"
                "</CopyObjectResult>"),
                {"Content-Type": "application/xml"})
            return
        with self.state.lock:
            if (self.headers.get("If-None-Match") == "*"
                    and key in self.state.objects):
                self._send(412, _xml(
                    "<Error><Code>PreconditionFailed</Code></Error>"),
                    {"Content-Type": "application/xml"})
                return
            self.state.objects[key] = body
        self._send(200, b"", {"ETag": '"x"'})

    def do_POST(self):
        key = self._key()
        q = self._query()
        if "uploads" in q:
            with self.state.lock:
                self.state.seq += 1
                uid = f"up-{self.state.seq}"
                self.state.uploads[uid] = {}
            self._send(200, _xml(
                "<InitiateMultipartUploadResult>"
                f"<Bucket>{key.split('/')[0]}</Bucket>"
                f"<Key>{key.partition('/')[2]}</Key>"
                f"<UploadId>{uid}</UploadId>"
                "</InitiateMultipartUploadResult>"),
                {"Content-Type": "application/xml"})
            return
        if "uploadId" in q:
            self._body()  # part list XML — order by part number instead
            with self.state.lock:
                parts = self.state.uploads.pop(q["uploadId"], {})
                self.state.objects[key] = b"".join(
                    parts[i] for i in sorted(parts))
            self._send(200, _xml(
                "<CompleteMultipartUploadResult>"
                f"<Key>{key.partition('/')[2]}</Key>"
                "<ETag>\"x\"</ETag>"
                "</CompleteMultipartUploadResult>"),
                {"Content-Type": "application/xml"})
            return
        if "delete" in q:
            body = self._body().decode()
            deleted = []
            with self.state.lock:
                for m in re.finditer(r"<Key>([^<]+)</Key>", body):
                    k = urllib.parse.unquote(
                        f"{key.split('/')[0]}/{m.group(1)}"
                        if key else m.group(1))
                    self.state.objects.pop(k, None)
                    deleted.append(
                        f"<Deleted><Key>{m.group(1)}</Key></Deleted>")
            self._send(200, _xml("<DeleteResult>" + "".join(deleted)
                                 + "</DeleteResult>"),
                       {"Content-Type": "application/xml"})
            return
        self._send(400)

    def do_DELETE(self):
        key = self._key()
        with self.state.lock:
            self.state.objects.pop(key, None)
        self._send(204)


def start() -> tuple[ThreadingHTTPServer, str, _State]:
    """Start on an ephemeral localhost port; returns (server,
    endpoint_url, state).  Call ``server.shutdown()`` when done."""
    state = _State()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", state
