"""Auto-imported by ``site`` at interpreter start in any process whose
PYTHONPATH contains this directory — the hook that applies the vendored-
protobuf compatibility patch inside Spark Python workers before
``pyspark.worker`` imports the transformWithState protobuf modules.

Deliberately self-contained (no package imports): workers may not have the
repo on their import path when this runs. Mirrors
``pulsar_topic_deduplicator_spark._pbcompat`` — see that module for the why.
"""

import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"
try:
    import google.protobuf  # noqa: F401 — a real install stays in charge
except ImportError:
    if _VENDORED not in sys.path:
        sys.path.insert(0, _VENDORED)
try:
    from google.protobuf import runtime_version

    runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:  # no protobuf anywhere — workers fall back gracefully
    pass
