"""parse-ext — pipe content through an external command (the last
unported parse plugin).

Parity target: ``reference/src/plugin/parse-ext/.../ExtParser.java``
(:71-142) + ``util/CommandRunner.java`` (:81-82 —
``Runtime.exec(String)``, whitespace-tokenized argv, NO shell):

- per-content-type command table ``{contentType: (command, timeout,
  encoding)}`` (setConf at :146-180; timeout default 30 s, encoding
  default platform charset — pinned to utf-8 here for determinism);
- the content type is appended as the command's final argument
  (``cr.setCommand(command + " " + contentType)``, :108);
- raw bytes are piped to stdin, stdout captured (:104-112);
- no command for the type -> FAILED empty parse (:76-79);
- a Content-Length header disagreeing with the byte count ->
  FAILED_TRUNCATED empty parse (:94-101);
- nonzero exit -> FAILED empty parse carrying stderr (:116-119);
- success -> text = stdout decoded under the configured encoding,
  empty title, outlinks = OutlinkExtractor over the text (:131-137 —
  compose with :func:`nutch_spark.operators.parse.text_outlinks`,
  the same extractor port).

Hardening beyond the reference (deliberate deviation): commands are
validated against an executable **allowlist** at registration — the
Java plugin will exec whatever the XML says, which is an arbitrary
remote-execution surface in a distributed engine; here argv[0]'s
basename must be allowlisted and no argument may contain shell
metacharacters (there is no shell, but metacharacters in args are a
smell of a copied shell command). ``ALLOWED_COMMANDS`` is the
conservative default; deployments extend it explicitly.

Scale shape: ``mapInPandas`` — one Arrow batch in, one subprocess per
row (the reference is likewise process-per-document). The UDF is a
pure narrow map: no shuffle, no driver state; per-row wall clock is
bounded by the configured timeout exactly as CommandRunner's
``setTimeout``. An external parser at 100 TB is inherently
process-bound — the plan's only job is to keep it embarrassingly
parallel, which a narrow map does.
"""

from __future__ import annotations

import re
import subprocess
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIMEOUT_DEFAULT = 30  # ExtParser.java:58 (seconds)

#: conservative default executable allowlist (basenames); extend per
#: deployment via ``ExtParserConfig(allowed=...)``
ALLOWED_COMMANDS = frozenset({"cat", "md5sum", "sha1sum", "wc", "strings"})

_METACHARS = re.compile(r"[|&;<>$`\\\"'\n*?(){}\[\]]")

_OUT_SCHEMA = "url string, status string, message string, text string"


@dataclass(frozen=True)
class ExtCommand:
    """One TYPE_PARAMS_MAP entry (command, timeout, encoding).
    ``append_type``: the reference always appends the content type as
    the command's final argument (its sample ``command`` script
    dispatches on ``$1``); False is a documented deviation for plain
    stdin filters like ``cat``/``md5sum`` that would misread the type
    as a filename."""

    command: str
    timeout: int = TIMEOUT_DEFAULT
    encoding: str = "utf-8"
    append_type: bool = True


class ExtParserConfig:
    """The plugin's content-type -> command table, allowlist-validated
    at registration time (fail fast on the driver, not per-task)."""

    def __init__(self, allowed: frozenset[str] | set[str] = ALLOWED_COMMANDS):
        self._allowed = frozenset(allowed)
        self._table: dict[str, ExtCommand] = {}

    def register(
        self,
        content_type: str,
        command: str,
        timeout: int = TIMEOUT_DEFAULT,
        encoding: str = "utf-8",
        append_type: bool = True,
    ) -> "ExtParserConfig":
        argv = command.split()
        if not argv:
            raise ValueError("empty command")
        exe = argv[0].rsplit("/", 1)[-1]
        if exe not in self._allowed:
            raise ValueError(
                f"command {exe!r} is not in the parse-ext allowlist "
                f"{sorted(self._allowed)}"
            )
        if _METACHARS.search(command):
            raise ValueError(
                f"shell metacharacters are not allowed in parse-ext "
                f"commands: {command!r}"
            )
        self._table[content_type] = ExtCommand(
            command, timeout, encoding, append_type
        )
        return self

    def lookup(self, content_type: str) -> ExtCommand | None:
        return self._table.get(content_type)

    def as_dict(self) -> dict[str, ExtCommand]:
        return dict(self._table)


def _run_one(
    url: str,
    content: bytes | None,
    content_type: str | None,
    content_length: int | None,
    table: dict[str, ExtCommand],
) -> tuple[str, str, str, str]:
    """One document through the reference's getParse decision tree."""
    params = table.get(content_type or "")
    if params is None:
        return (
            url,
            "failed",
            f"No external command defined for contentType: {content_type}",
            "",
        )
    raw = bytes(content) if content is not None else b""
    if content_length is not None and len(raw) != int(content_length):
        return (
            url,
            "failed_truncated",
            f"Content truncated at {len(raw)} bytes. Parser can't handle "
            f"incomplete {content_type} file.",
            "",
        )
    argv = params.command.split() + (
        [content_type] if params.append_type else []
    )
    try:
        proc = subprocess.run(
            argv,
            input=raw,
            capture_output=True,
            timeout=params.timeout,
            shell=False,
        )
    except subprocess.TimeoutExpired:
        return (url, "failed", f"External command {params.command} timed out", "")
    except OSError as e:
        return (url, "failed", f"External command {params.command} failed: {e}", "")
    if proc.returncode != 0:
        return (
            url,
            "failed",
            f"External command {params.command} failed with error: "
            f"{proc.stderr.decode('utf-8', errors='replace')}",
            "",
        )
    text = proc.stdout.decode(params.encoding, errors="replace")
    return (url, "success", "", text)


def ext_parse(
    segment: DataFrame,
    config: ExtParserConfig,
    *,
    url_col: str = "url",
    content_col: str = "content",
    type_col: str = "content_type",
    length_col: str | None = None,
) -> DataFrame:
    """Run every document through its configured external command.

    Returns (url, status, message, text): status ``success`` /
    ``failed`` / ``failed_truncated`` per the reference's ParseStatus
    arms. Compose outlinks with ``text_outlinks(result.filter(status ==
    'success'))`` — ExtParser's own final step (:131-137).
    """
    table = config.as_dict()
    cols = [
        F.col(url_col).alias("_u"),
        F.col(content_col).alias("_c"),
        F.col(type_col).alias("_t"),
    ]
    if length_col is not None:
        cols.append(F.col(length_col).cast("long").alias("_l"))
    else:
        cols.append(F.lit(None).cast("long").alias("_l"))
    narrowed = segment.select(*cols)

    def run_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _run_one(u, c, t, None if pd.isna(l) else int(l), table)
                for u, c, t, l in zip(pdf["_u"], pdf["_c"], pdf["_t"], pdf["_l"])
            ]
            yield pd.DataFrame(
                rows, columns=["url", "status", "message", "text"]
            )

    return narrowed.mapInPandas(run_batches, _OUT_SCHEMA)
