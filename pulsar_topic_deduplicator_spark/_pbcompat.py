"""Make ``google.protobuf`` importable from the container's vendored copy so
``transformWithStateInPandas`` (which needs it in driver AND Python workers)
can run where pip installs are unavailable.

This environment ships no installed protobuf, but the Cloud SDK's App Engine
runtime vendors a pure-Python protobuf 6.32 at a well-known path. PySpark
4.1's generated ``StateMessage_pb2`` declares gencode 6.33, and protobuf's
runtime gate rejects runtime < gencode even across a single minor release —
though the wire format is stable within a major version. So, after putting
the vendored runtime on ``sys.path``, we no-op
``runtime_version.ValidateProtobufRuntimeVersion`` (a scoped, documented
compatibility patch: drop it as soon as a protobuf >= 6.33 runtime is
installable, at which point ``enable()`` short-circuits to the real install).

Worker processes can't be patched from here directly, so ``enable()``
prepends ``shims/`` (which holds a self-contained ``sitecustomize.py``
applying the same patch) plus the vendored dir to:

* ``os.environ["PYTHONPATH"]`` — inherited by any JVM/daemon launched later;
* ``sc.environment["PYTHONPATH"]`` of the ACTIVE SparkContext, if any —
  PySpark snapshots ``sc.environment`` into every Python function it wraps,
  and the worker factory keys daemons by (exec, env), so queries defined
  after this call get fresh workers that auto-import ``sitecustomize``.

``site`` imports ``sitecustomize`` at interpreter start from anywhere on the
initial ``sys.path``, which is exactly when it must run — before
``pyspark.worker`` imports the state-server protobuf modules.
"""

from __future__ import annotations

import os
import pathlib
import sys

VENDORED_PROTOBUF_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"
SHIMS_DIR = str(pathlib.Path(__file__).resolve().parent / "shims")


def _gencode_gate_passes() -> bool:
    """Import PySpark's transformWithState generated module — the exact
    import the state server performs, so this passes iff the ACTIVE
    protobuf runtime satisfies the gencode's version requirement."""
    import importlib

    try:
        importlib.import_module(
            "pyspark.sql.streaming.proto.StateMessage_pb2"
        )
        return True
    except Exception:
        return False


def _patch_runtime_gate() -> None:
    from google.protobuf import runtime_version

    runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None


def _propagate_to_workers() -> None:
    def merged(existing: str) -> str:
        parts = [SHIMS_DIR, VENDORED_PROTOBUF_DIR] + [
            p for p in existing.split(os.pathsep) if p
        ]
        return os.pathsep.join(dict.fromkeys(parts))

    os.environ["PYTHONPATH"] = merged(os.environ.get("PYTHONPATH", ""))
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is not None:
            sc.environment["PYTHONPATH"] = merged(
                sc.environment.get("PYTHONPATH", "")
            )
    except Exception:
        pass


def enable_vendored_protobuf() -> bool:
    """Idempotent: returns True iff ``google.protobuf`` is usable (and worker
    propagation is in place). Call again right before defining a
    transformWithState query so an active SparkContext picks up the env."""
    try:
        import google.protobuf

        vendored = (google.protobuf.__file__ or "").startswith(
            VENDORED_PROTOBUF_DIR
        )
        if not vendored:
            # a REAL install: if it satisfies the gencode's version gate
            # outright, do nothing — workers resolve the same install from
            # site-packages and the gate stays ACTIVE (it exists to catch
            # gencode/runtime skew). Verified by importing the exact module
            # the state server loads, not by comparing version strings.
            if _gencode_gate_passes():
                return True
            # real but OLDER than the gencode: cross-MAJOR skew is a hard
            # no (wire compat not guaranteed); same-major earns the same
            # scoped exemption as the vendored 6.32, driver AND workers
            # (the shim no longer shadows a real install — it only patches
            # the gate).
            major = getattr(google.protobuf, "__version__", "0").split(".")[0]
            if not major.isdigit() or int(major) < 6:
                return False
            _patch_runtime_gate()
            _propagate_to_workers()
            return True
        _patch_runtime_gate()
        _propagate_to_workers()
        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDORED_PROTOBUF_DIR, "google", "protobuf")):
        return False
    if VENDORED_PROTOBUF_DIR not in sys.path:
        sys.path.insert(0, VENDORED_PROTOBUF_DIR)
    try:
        _patch_runtime_gate()
        import google.protobuf  # noqa: F401
    except Exception:
        return False
    _propagate_to_workers()
    return True
