"""Object-store claim backend: atomic put-if-absent over S3-compatible
conditional writes.

The manifest's commit protocol needs exactly one primitive — an atomic
put-if-absent of a small metadata record (``manifest_source._claim``).
On a POSIX filesystem that is a hard link; on S3-compatible stores it
is a conditional PUT with ``If-None-Match: *`` (public AWS S3 feature
since 2024, supported by MinIO), the same primitive Delta's
S3DynamoDBLogStore substitutes a DynamoDB conditional write for.

``S3ClaimBackend`` claims the name in the object store and, on a won
claim, mirrors the payload to the local path the engine's readers
list — the commit-service topology: the STORE arbitrates writers, the
table directory (a mounted volume, HDFS, or the same bucket via s3a)
holds the bytes.  Readers never consult the store; a lost claim means
another writer already published the identical-name record.

Deployment: point ``SPARK_GRAFT_CLAIM_BACKEND`` at
``data_engineering_pipeline_project_cloud_spark.sources.object_store:claim_backend_from_env`` and set
``SPARK_GRAFT_S3_BUCKET`` / ``SPARK_GRAFT_S3_ENDPOINT`` (plus the
standard AWS credential variables) — the env-var form reaches the
distributed writer's worker process, where driver globals don't
(see ``manifest_source._default_claim_backend``).  Reference parity:
the reference reads S3 under an IAM role (scripts/main.py:44-49);
this module is the engine's write-side half of that posture.
"""

from __future__ import annotations

import os


class S3ClaimBackend:
    """Put-if-absent via S3 conditional PUT (``If-None-Match: *``).

    ``mirror_local=True`` (default) writes the payload to the local
    claim path after a WON claim, keeping the table directory
    self-contained for readers — safe because the store guarantees a
    unique winner per name.  Claims key as
    ``{prefix}/{abs table dir}/{name}`` so distinct tables never
    collide in one bucket.
    """

    def __init__(self, bucket: str, prefix: str = "claims",
                 endpoint_url: str | None = None,
                 mirror_local: bool = True, client=None):
        if client is None:
            import boto3  # gated: only object-store deployments need it

            client = boto3.client("s3", endpoint_url=endpoint_url)
        self._s3 = client
        self._bucket = bucket
        self._prefix = prefix.strip("/")
        self._mirror = mirror_local

    def _key(self, directory: str, name: str) -> str:
        d = os.path.abspath(directory).strip("/")
        return f"{self._prefix}/{d}/{name}"

    def put_if_absent(self, directory: str, name: str,
                      payload: str) -> bool:
        try:
            self._s3.put_object(
                Bucket=self._bucket, Key=self._key(directory, name),
                Body=payload.encode(), IfNoneMatch="*")
        except self._s3.exceptions.ClientError as exc:
            code = exc.response.get("ResponseMetadata", {}).get(
                "HTTPStatusCode")
            if code in (409, 412):  # PreconditionFailed / Conflict
                return False
            raise
        if self._mirror:
            os.makedirs(directory, exist_ok=True)
            import uuid

            dest = os.path.join(directory, name)
            tmp = os.path.join(directory,
                               f".{name}.{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as fh:
                fh.write(payload)
            os.replace(tmp, dest)  # we are the unique winner
        return True


def claim_backend_from_env() -> S3ClaimBackend:
    """Factory for ``SPARK_GRAFT_CLAIM_BACKEND`` — reads
    ``SPARK_GRAFT_S3_BUCKET`` (required), ``SPARK_GRAFT_S3_ENDPOINT``
    and ``SPARK_GRAFT_S3_CLAIM_PREFIX`` (optional)."""
    bucket = os.environ["SPARK_GRAFT_S3_BUCKET"]
    return S3ClaimBackend(
        bucket,
        prefix=os.environ.get("SPARK_GRAFT_S3_CLAIM_PREFIX", "claims"),
        endpoint_url=os.environ.get("SPARK_GRAFT_S3_ENDPOINT") or None)
