"""Config-driven pipeline composition — the PageParser analog.

The reference's production entry point builds an ordered stage list
from an ini config (``document_ocr/page_parser.py:459-483``: up to 9
LAYOUT_PARSER sections, cropper/OCR/decoder factories) and runs every
stage through the uniform signature ``process_page(img, layout) ->
layout`` (``page_parser.py:515-531``).

Here the uniform signature is ``stage(df: DataFrame) -> DataFrame``
and the "config" is a declarative dict. Composing stages composes
Catalyst plans — the optimizer sees the WHOLE pipeline, so filters
written in a late stage still push into the scan. The physical plan
is owned by Spark; this module only owns stage order.

Example::

    pipe = Pipeline.from_config({
        "stages": ["explode", "classify", "strip", "order"],
    })
    out = pipe(corpus.spans_table(spark, sf_dir))
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from pero_ocr_spark.operators import extract

Stage = Callable[[DataFrame], DataFrame]


def _lazy(modname: str, fn: str) -> Stage:
    def stage(df: DataFrame) -> DataFrame:
        import importlib

        mod = importlib.import_module(f"pero_ocr_spark.operators.{modname}")
        return getattr(mod, fn)(df)

    return stage

# stage registry — the analog of the LAYOUT_PARSER_* METHOD factory
# (page_parser.py:29-74); extendable by callers via register_stage.
STAGES: dict[str, Stage] = {
    "explode": extract.explode_spans,
    "classify": extract.classify_spans,
    "strip": extract.strip_boilerplate,
    "order": extract.assign_reading_order,
    "project": lambda df: df.select("doc_id", "kind", "text", "media_ref", "ord"),
    # web-ingest front door (operators/html.py)
    "html_synthesize": _lazy("html", "synthesize_html_interleaved"),
    "html_parse": _lazy("html", "parse_html_blocks"),
    "html_classify": _lazy("html", "classify_blocks"),
    "html_spans": _lazy("html", "html_to_spans"),
    # training-side serialization (operators/extract.py, media.py)
    "render_train": _lazy("extract", "render_training_text"),
    "media_pairs": _lazy("media", "media_context_pairs"),
}


def register_stage(name: str, fn: Stage) -> None:
    STAGES[name] = fn


class Pipeline:
    """Ordered composition of named or callable stages."""

    def __init__(self, stages: list[Stage]):
        self.stages = stages

    @classmethod
    def from_config(cls, config: dict) -> "Pipeline":
        stages: list[Stage] = []
        for s in config.get("stages", []):
            if callable(s):
                stages.append(s)
            elif s in STAGES:
                stages.append(STAGES[s])
            else:
                raise KeyError(
                    f"unknown stage {s!r}; registered: {sorted(STAGES)}"
                )
        return cls(stages)

    def __call__(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage(df)
        return df


DEFAULT_EXTRACT = {"stages": ["explode", "classify", "strip", "order", "project"]}


def default_extract_pipeline() -> Pipeline:
    return Pipeline.from_config(DEFAULT_EXTRACT)
