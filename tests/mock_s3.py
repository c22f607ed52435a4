"""In-memory S3 REST transport for S3CommitBackend tests.

Implements the slice of the S3 HTTP API the backend issues, with the
DOCUMENTED semantics of a GENERAL-PURPOSE bucket: conditional PUT
(If-None-Match: * and If-Match: <etag>), HEAD/GET with ETag and
Last-Modified, and ListObjectsV2 with prefix + delimiter grouping and
continuation-token pagination (page size deliberately tiny so the
pagination loop actually exercises). Conditional DeleteObject is
REJECTED (501) because GP buckets do not support it (directory buckets
only) -- a structural tripwire against backend code leaning on it. All
request handling runs under one lock -- the linearizability S3
documents for conditional requests.

Fault injection: `fail_every=n` returns a 503 for every n-th request,
exercising the backend's bounded-retry path without changing any
outcome (every primitive is idempotent given the backend's CAS
lost-response disambiguation).
"""

from __future__ import annotations

import hashlib
import threading
import time
import urllib.parse
from email.utils import format_datetime
from datetime import datetime, timezone
from xml.sax.saxutils import escape


class MockS3Transport:
    PAGE_SIZE = 3  # tiny: forces ListObjectsV2 pagination in tests

    def __init__(self, fail_every: int = 0):
        self._lock = threading.Lock()
        # key -> (body: bytes, etag: str, mtime_epoch: float)
        self._objects: dict[str, tuple[bytes, str, float]] = {}
        self._fail_every = fail_every
        self._n_requests = 0
        self.n_faults = 0

    def __call__(self, method, url, headers, body):
        with self._lock:
            self._n_requests += 1
            if self._fail_every and self._n_requests % self._fail_every == 0:
                self.n_faults += 1
                return 503, {}, b"<Error><Code>SlowDown</Code></Error>"
            parts = urllib.parse.urlsplit(url)
            # path = /<bucket>/<key...>
            _, _bucket, key = parts.path.split("/", 2)
            key = urllib.parse.unquote(key)
            query = urllib.parse.parse_qs(parts.query)
            if method == "GET" and "list-type" in query:
                return self._list(query)
            if method == "PUT":
                return self._put(key, headers, body)
            if method == "GET":
                return self._get(key)
            if method == "HEAD":
                return self._head(key)
            if method == "DELETE":
                return self._delete(key, headers)
            return 405, {}, b""

    # -- handlers (lock held) ---------------------------------------------
    @staticmethod
    def _meta(body: bytes) -> tuple[str, float]:
        return f'"{hashlib.md5(body).hexdigest()}"', time.time()

    @staticmethod
    def _http_date(epoch: float) -> str:
        return format_datetime(
            datetime.fromtimestamp(epoch, tz=timezone.utc), usegmt=True)

    def _put(self, key, headers, body):
        body = body or b""
        if headers.get("If-None-Match") == "*" and key in self._objects:
            return 412, {}, b"<Error><Code>PreconditionFailed</Code></Error>"
        cond = headers.get("If-Match")
        if cond is not None:
            # GP buckets support conditional PUT: 404 for a missing
            # key, 412 when the stored ETag no longer matches
            entry = self._objects.get(key)
            if entry is None:
                return 404, {}, b"<Error><Code>NoSuchKey</Code></Error>"
            if entry[1] != cond:
                return (412, {},
                        b"<Error><Code>PreconditionFailed</Code></Error>")
        etag, mtime = self._meta(body)
        self._objects[key] = (body, etag, mtime)
        return 200, {"ETag": etag}, b""

    def _get(self, key):
        entry = self._objects.get(key)
        if entry is None:
            return 404, {}, b"<Error><Code>NoSuchKey</Code></Error>"
        body, etag, mtime = entry
        return 200, {"ETag": etag,
                     "Last-Modified": self._http_date(mtime)}, body

    def _head(self, key):
        status, h, _body = self._get(key)
        return status, h, b""

    def _delete(self, key, headers):
        if headers.get("If-Match") is not None:
            # general-purpose buckets do NOT support conditional
            # DeleteObject (directory buckets only) -- reject loudly so
            # no backend code path can lean on semantics real GP-bucket
            # S3 does not provide
            return 501, {}, b"<Error><Code>NotImplemented</Code></Error>"
        self._objects.pop(key, None)
        return 204, {}, b""

    def _list(self, query):
        prefix = query.get("prefix", [""])[0]
        delimiter = query.get("delimiter", [""])[0]
        start_after = query.get("continuation-token", [""])[0]
        keys = sorted(k for k in self._objects if k.startswith(prefix))
        if start_after:
            keys = [k for k in keys if k > start_after]
        contents: list[str] = []
        prefixes: list[str] = []
        emitted = 0
        truncated = False
        next_token = ""
        for k in keys:
            if emitted >= self.PAGE_SIZE:
                truncated = True
                break
            rest = k[len(prefix):]
            if delimiter and delimiter in rest:
                p = prefix + rest.split(delimiter, 1)[0] + delimiter
                if p not in prefixes:
                    prefixes.append(p)
                    emitted += 1
                next_token = p.rstrip(delimiter) + "\x7f"
            else:
                contents.append(k)
                emitted += 1
                next_token = k
        xml = ["<ListBucketResult>"]
        for k in contents:
            xml.append(f"<Contents><Key>{escape(k)}</Key></Contents>")
        for p in prefixes:
            xml.append(
                f"<CommonPrefixes><Prefix>{escape(p)}</Prefix>"
                f"</CommonPrefixes>")
        xml.append(f"<IsTruncated>{'true' if truncated else 'false'}"
                   f"</IsTruncated>")
        if truncated:
            xml.append(f"<NextContinuationToken>{escape(next_token)}"
                       f"</NextContinuationToken>")
        xml.append("</ListBucketResult>")
        return 200, {}, "".join(xml).encode()
