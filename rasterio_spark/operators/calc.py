"""Band math — the engine's `rio calc` (SURVEY.md §2.8).

The reference evaluates a lisp-like snuggs expression over band arrays
(/root/reference/rasterio/rio/calc.py:59-217). Here Spark SQL `expr()`
replaces the whole interpreter: bands pivot to columns ``b1..bN``, the
expression is any SQL scalar expression over them, and the result
returns to long form. Catalyst does constant folding and codegen — the
interpreter is free.

    calc(cells, "0.95 * b1 + 10")        # rio calc "(+ (* 0.95 (read 1)) 10)"
    calc(cells, "greatest(b1, b2, b3)")  # multi-band
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# snuggs -> SQL operator table (reference rasterio/_vendor/snuggs.py
# op_map + numpy funcs used by rio calc tests). n-ary arithmetic and
# logicals fold left; comparisons are binary.
_SNUGGS_INFIX = {
    "+": "+", "-": "-", "*": "*", "/": "/", "%": "%",
    "&": "AND", "&&": "AND", "and": "AND",
    "|": "OR", "||": "OR", "or": "OR",
    ">": ">", "<": "<", ">=": ">=", "<=": "<=", "==": "=", "!=": "!=",
}
_SNUGGS_FUNCS = {
    "min": "least", "fmin": "least",
    "max": "greatest", "fmax": "greatest",
    "abs": "abs", "sqrt": "sqrt", "exp": "exp",
    "log": "ln", "log10": "log10",
    "sin": "sin", "cos": "cos", "tan": "tan",
    "asin": "asin", "acos": "acos", "atan": "atan",
    "floor": "floor", "ceil": "ceil",
}


def _snuggs_tokens(src: str) -> list[str]:
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        else:
            j = i
            while j < n and not src[j].isspace() and src[j] not in "()":
                j += 1
            out.append(src[i:j])
            i = j
    return out


def _snuggs_parse(tokens: list[str], pos: int = 0):
    if tokens[pos] != "(":
        return tokens[pos], pos + 1
    pos += 1
    node = []
    while tokens[pos] != ")":
        child, pos = _snuggs_parse(tokens, pos)
        node.append(child)
    return node, pos + 1


def _snuggs_emit(node) -> str:
    if isinstance(node, str):
        return node  # number, band name (bN), or bare symbol
    head, args = node[0], node[1:]
    if head in ("read", "take"):
        # (read 1) / (read 1 j) / (take name j): input index maps to the
        # single cell table; the band index (default 1) becomes column bj
        band = args[1] if len(args) > 1 else "1"
        return f"b{band}"
    if head == "!" or head == "not":
        return f"(NOT {_snuggs_emit(args[0])})"
    if head == "where":
        c, a, b = (_snuggs_emit(a) for a in args)
        return f"(CASE WHEN {c} THEN {a} ELSE {b} END)"
    if head in _SNUGGS_INFIX:
        if head == "-" and len(args) == 1:
            return f"(- {_snuggs_emit(args[0])})"
        op = _SNUGGS_INFIX[head]
        return "(" + f" {op} ".join(_snuggs_emit(a) for a in args) + ")"
    if head in _SNUGGS_FUNCS:
        return f"{_SNUGGS_FUNCS[head]}({', '.join(_snuggs_emit(a) for a in args)})"
    raise ValueError(f"unsupported snuggs operator {head!r}")


def snuggs_to_sql(expression: str) -> str:
    """Translate a rio-calc snuggs s-expression to a SQL scalar
    expression over band columns b1..bN.

        (+ 125 (* 0.1 (read 1 1)))  ->  (125 + (0.1 * b1))
        (>= (read 1 1) 127)         ->  (b1 >= 127)

    Catalyst then folds/compiles it — the engine needs no interpreter
    (reference evaluates via rasterio/_vendor/snuggs.py)."""
    tokens = _snuggs_tokens(expression)
    node, pos = _snuggs_parse(tokens)
    if pos != len(tokens):
        raise ValueError("trailing tokens in snuggs expression")
    return _snuggs_emit(node)


def to_wide(cells: DataFrame, bands: list[int]) -> DataFrame:
    """(band,row,col,value,valid) -> (row, col, b1..bN[, v1..vN])."""
    aggs = []
    for b in bands:
        aggs.append(
            F.max(F.when(F.col("band") == b, F.col("value"))).alias(f"b{b}")
        )
        aggs.append(
            F.max(F.when(F.col("band") == b, F.col("valid").cast("int")))
            .cast("boolean")
            .alias(f"v{b}")
        )
    return cells.groupBy("row", "col").agg(*aggs)


def calc(
    cells: DataFrame,
    expression: str,
    bands: list[int] | None = None,
    out_band: int = 1,
    nodata: float | None = None,
    require_valid: bool = True,
) -> DataFrame:
    """Evaluate a SQL expression over band columns b1..bN per cell.

    ``require_valid``: cells where any referenced band is invalid become
    nodata/invalid (mirrors masked-array propagation in rio calc).
    Returns (band, row, col, value, valid).

    ``expression`` is SQL infix, or a rio-calc snuggs s-expression when
    it starts with "(" — translated by :func:`snuggs_to_sql`.

    ``bands=None`` infers the band list from the ``b<N>`` references in
    the expression — pure plan construction, no Spark job, and the
    pivot only carries bands the expression actually uses. Pass
    ``bands="discover"`` to opt in to discovering every band present in
    the table (runs a distinct job at plan time), or an explicit list
    (e.g. from the layer descriptor's ``count``).
    """
    import re

    if expression.lstrip().startswith("("):
        expression = snuggs_to_sql(expression)
    if bands is None:
        # case-insensitive: Spark SQL resolves B1/b1 identically. A
        # b<N> token inside a string literal would be inferred too —
        # pass bands= explicitly for expressions like that.
        bands = sorted({int(m) for m in re.findall(r"\b[bB](\d+)\b", expression)})
        if not bands:
            raise ValueError(
                "calc: expression references no b<N> bands; pass bands= "
                "explicitly (or bands='discover' to scan the table)"
            )
    elif bands == "discover":
        bands = [r["band"] for r in cells.select("band").distinct().orderBy("band").collect()]
    wide = to_wide(cells, bands)
    value = F.expr(expression)
    used = [b for b in bands if f"b{b}" in expression]
    if require_valid and used:
        all_valid = None
        for b in used:
            v = F.col(f"v{b}")
            all_valid = v if all_valid is None else (all_valid & v)
        valid = F.coalesce(all_valid, F.lit(False))
    else:
        valid = F.lit(True)
    out_value = F.when(valid, value)
    if nodata is not None:
        out_value = F.coalesce(out_value, F.lit(nodata))
    return wide.select(
        F.lit(out_band).alias("band"),
        "row",
        "col",
        out_value.cast("double").alias("value"),
        valid.alias("valid"),
    )


def calc_sql(expression: str, bands: list[int], out_band: int = 1, nodata: float | None = None, cells_cte: str = "cells") -> str:
    """DuckDB oracle twin of calc (require_valid semantics)."""
    band_cols = []
    for b in bands:
        band_cols.append(f"max(CASE WHEN band = {b} THEN value END) AS b{b}")
        band_cols.append(f"bool_or(band = {b} AND valid) AS v{b}")
    used = [b for b in bands if f"b{b}" in expression]
    valid = " AND ".join(f"COALESCE(v{b}, FALSE)" for b in used) or "TRUE"
    val = f"CASE WHEN {valid} THEN CAST({expression} AS DOUBLE) END"
    if nodata is not None:
        val = f"COALESCE({val}, {nodata!r})"
    return f"""
        SELECT {out_band} AS band, row, col,
               {val} AS value,
               ({valid}) AS valid
        FROM (
          SELECT row, col, {", ".join(band_cols)}
          FROM {cells_cte} GROUP BY row, col
        )
    """
