"""Scratch-directory hygiene for the fixture-backed registry queries.

Several registered queries build their fixtures under
``tempfile.gettempdir()`` keyed by a hash of the sf_dir (stream epoch
files, ingest round-trip corpora, the bloom side table, the backfill
and bucketed-join tables). Each builder rmtree's ITS OWN tree on
re-entry, so correctness never depends on cleanup — but the trees
accumulate across sessions on a long-lived host (one tree per
(kind, sf_dir) pair, some hundreds of MB), which skews disk and page
cache between bench runs. :func:`clean_scratch` is the one sweep,
called by bench.py and scale_probe.py at the end of a run and safe to
invoke any time no query is mid-flight.

The probe corpus (``/tmp/takuan_sfprobe``) is deliberately KEPT: it is
shared across probe runs, marker-invalidated on scale or version
change (scale_probe.build_probe_corpus), and costs minutes to rebuild.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

#: every per-(kind, sf_dir) scratch prefix the registry queries create;
#: a new fixture family must add its prefix here (tests assert the
#: sweep removes a sample of each).
SCRATCH_PREFIXES = (
    "takuan_stream_fold_",
    "takuan_ingest_",
    "takuan_bloom_fold_",
    "takuan_backfill_overwrite_",
    "takuan_bucketed_",
)


def clean_scratch() -> list[str]:
    """Best-effort removal of all registry-query scratch trees.

    Returns the list of paths removed (for logging). Errors are
    swallowed per-tree — a busy file on one tree must not abort the
    sweep of the rest.
    """
    removed: list[str] = []
    tmp = tempfile.gettempdir()
    for prefix in SCRATCH_PREFIXES:
        for path in sorted(glob.glob(os.path.join(tmp, prefix + "*"))):
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
                if not os.path.exists(path):
                    removed.append(path)
    return removed
