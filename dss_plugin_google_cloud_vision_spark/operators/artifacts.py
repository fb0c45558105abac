# -*- coding: utf-8 -*-
"""Annotated-artifact generation and blob sink — the S6 analogue.

The reference ships an "annotated blob" side output with every recipe:
``format_save_images`` draws the detected bounding polygons on each image
and uploads the result as a new blob (reference:
python-lib/api_image_formatting.py:107-148, second thread pool at :127;
uploads via ``upload_stream``, python-lib/document_utils.py:94,124; wired
in every recipe, e.g. custom-recipes/
google-cloud-vision-image-text-detection/recipe.py:27-28).

In the text-extraction engine, pixel overlays become CHARACTER-SPAN
overlays: the annotated artifact is the extracted text with visible
``[[kind#id]] ... [[/]]`` markers around every extracted block span — the
same "draw the detection boundaries onto the payload" semantics. Two
surfaces:

- ``annotated_text_column``: a pure JVM column expression (one
  ``aggregate`` fold over the span array — no Python, no shuffle), so the
  artifact can be carried as a column or written with the normal sink.
- ``write_annotated_artifacts``: one artifact file per document via
  ``foreachPartition`` — executor-side blob writes with no driver round
  trip (the reference's driver-side thread pool becomes task parallelism).
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MARKER_OPEN = "[["
MARKER_CLOSE = "]]"
MARKER_END = "[[/]]"


def annotated_text_column(text: Column, spans: Column) -> Column:
    """Overlay span markers onto ``text``.

    ``spans`` is an ``array<struct<kind:string, start:int, end:int,
    block_id:int>>`` with char offsets into ``text``, sorted by ``start``
    and non-overlapping (the extraction kernels' span contract). Output:
    ``gap [[kind#id]] body [[/]] gap ...`` — every byte of the original
    text is preserved, markers are insertions only.
    """
    spans = F.coalesce(spans, F.array())

    def step(acc: Column, s: Column) -> Column:
        gap = text.substr(acc["pos"] + 1, s["start"] - acc["pos"])
        body = text.substr(s["start"] + 1, s["end"] - s["start"])
        marker = F.concat(
            F.lit(MARKER_OPEN),
            s["kind"],
            F.lit("#"),
            s["block_id"].cast("string"),
            F.lit(MARKER_CLOSE),
        )
        return F.struct(
            s["end"].alias("pos"),
            F.concat(acc["out"], gap, marker, body, F.lit(MARKER_END)).alias("out"),
        )

    return F.aggregate(
        spans,
        F.struct(F.lit(0).alias("pos"), F.lit("").alias("out")),
        step,
        lambda acc: F.concat(acc["out"], text.substr(acc["pos"] + 1, F.length(text) - acc["pos"])),
    )


def strip_annotations(annotated: Column) -> Column:
    """Inverse overlay: markers are insertions only, so stripping them
    recovers the original text byte-for-byte PROVIDED the source text
    itself contains no marker-shaped substrings (``[[kind#N]]`` /
    ``[[/]]``) — the same caveat as any in-band overlay, matching the
    reference's pixel overlays which are lossy outright
    (api_image_formatting.py:80-105 draws onto the image)."""
    return F.regexp_replace(annotated, r"\[\[(/|[^\]#]+#\d+)\]\]", "")


def artifact_name(url: str, suffix: str = ".txt") -> str:
    """Deterministic artifact blob name for a document url (the analogue
    of the reference's ``path_0_annotated`` naming,
    api_image_formatting.py:118-121 — hashed because urls aren't paths)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest() + suffix


def write_annotated_artifacts(
    df: DataFrame,
    directory: str,
    url_column: str = "url",
    artifact_column: str = "annotated",
    suffix: str = ".txt",
) -> None:
    """S6 blob sink: one artifact file per document, written ON THE
    EXECUTORS via ``foreachPartition`` (no collect, no driver loop). The
    target must be a shared filesystem / object-store mount — the same
    contract as the reference's managed folder."""
    rows = df.select(F.col(url_column).cast("string"), F.col(artifact_column).cast("string"))

    def write_partition(iterator) -> None:
        # executor-local: guarantee the directory exists on THIS node (a
        # driver-side makedirs may not have propagated on some mounts)
        os.makedirs(directory, exist_ok=True)
        for row in iterator:
            path = os.path.join(directory, artifact_name(row[0], suffix))
            # atomic publish: a retried/speculative task must never expose
            # a torn artifact to a concurrent reader — write task-unique
            # temp, then os.replace (atomic on POSIX)
            tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w", encoding="utf-8") as handle:
                handle.write(row[1] or "")
            os.replace(tmp, path)

    rows.foreachPartition(write_partition)
