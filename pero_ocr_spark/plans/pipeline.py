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
    def from_ini(cls, source: str) -> "Pipeline":
        """Ini-file front door — the analog of the reference's
        configparser-driven PageParser construction
        (``document_ocr/page_parser.py:457-483``, which walks numbered
        ``LAYOUT_PARSER_{i}`` sections and a METHOD factory key).

        ``source`` is a path to an ``.ini`` file or the ini text
        itself. Two equivalent spellings:

        * numbered sections, reference-style::

            [STAGE_1]
            METHOD = explode
            [STAGE_2]
            METHOD = classify

        * or a ``[PIPELINE]`` section with a comma list::

            [PIPELINE]
            STAGES = explode, classify, strip, order, project

        Unknown METHOD / stage names raise ``KeyError`` naming the
        registered stages, like ``from_config``."""
        import configparser
        import os

        cfg = configparser.ConfigParser()
        if os.path.sep in source or os.path.isfile(source):
            with open(source) as f:
                cfg.read_string(f.read())
        else:
            cfg.read_string(source)

        names: list[str] = []
        # numbered sections first (reference walks LAYOUT_PARSER_1..9;
        # we allow 1..99 of our uniform STAGE_{i})
        for i in range(1, 100):
            sec = f"STAGE_{i}"
            if not cfg.has_section(sec):
                continue
            method = cfg.get(sec, "METHOD", fallback=None)
            if method is None:
                raise KeyError(f"section [{sec}] has no METHOD key")
            names.append(method.strip())
        if not names and cfg.has_section("PIPELINE"):
            raw = cfg.get("PIPELINE", "STAGES", fallback="")
            names = [s.strip() for s in raw.split(",") if s.strip()]
        if not names:
            raise KeyError(
                "ini defines no stages: add [STAGE_1]..[STAGE_n] "
                "sections with METHOD keys or [PIPELINE] STAGES = ..."
            )
        return cls.from_config({"stages": names})

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
