"""Scoring expressions — the expressions module role
(lucene/expressions/src/java/org/apache/lucene/expressions/Expression.java,
js/JavascriptCompiler.java): combine the relevance score with document
features through a compiled arithmetic expression
(FunctionScoreQuery / DoubleValuesSource semantics).

The reference compiles a Javascript-ish grammar to bytecode; here a
restricted Python arithmetic expression compiles once (per searcher /
per actor — the stateful-stage rule) and evaluates VECTORIZED over the
whole hit set: variables are ``score`` plus any stored-field column,
functions are a whitelisted numpy subset. No attribute access, no
builtins — names outside the whitelist fail at compile time.
"""

from __future__ import annotations

import ast

import numpy as np

def _haversin_m(lat1, lon1, lat2, lon2):
    """expressions/js/ExpressionMath.java haversin binding (the
    SloppyMath.haversinMeters contract): great-circle meters, every
    argument scalar or vector — the same float64 formula tree as
    pipelines/geo.haversine_meters (the house geo-parity contract)."""
    from lucene_ray.pipelines.geo import EARTH_MEAN_RADIUS_M

    x1 = np.radians(np.asarray(lat1, dtype=np.float64))
    x2 = np.radians(np.asarray(lat2, dtype=np.float64))
    h1 = 1.0 - np.cos(x1 - x2)
    h2 = 1.0 - np.cos(np.radians(
        np.asarray(lon1, dtype=np.float64)
        - np.asarray(lon2, dtype=np.float64)))
    h = h1 + np.cos(x1) * np.cos(x2) * h2
    return EARTH_MEAN_RADIUS_M * 2.0 * np.arcsin(
        np.minimum(1.0, np.sqrt(h * 0.5)))


_FUNCS = {
    "log": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
    "exp": np.exp,
    # the reference's expression language ships geo distance built in
    # (expressions/js/ExpressionMath.java:34, haversin(lat1,lon1,lat2,lon2))
    "haversin": _haversin_m,
}

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Call, ast.Name, ast.Load,
    ast.Constant, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod,
    ast.USub, ast.UAdd, ast.IfExp, ast.Compare, ast.Gt, ast.GtE, ast.Lt,
    ast.LtE, ast.Eq, ast.NotEq,
)


class Expression:
    """A compiled, vectorized scoring expression."""

    def __init__(self, source: str, variables: list[str]):
        tree = ast.parse(source, mode="eval")
        for node in ast.walk(tree):
            if not isinstance(node, _ALLOWED_NODES):
                raise ValueError(
                    f"expression node {type(node).__name__} not allowed"
                )
            if isinstance(node, ast.Call):
                if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                    raise ValueError("only whitelisted functions allowed")
            if isinstance(node, ast.Name) and node.id not in _FUNCS \
                    and node.id not in variables:
                raise ValueError(f"unknown variable {node.id!r}")
        self.source = source
        self.variables = list(variables)
        self._code = compile(tree, "<expression>", "eval")

    def evaluate(self, **arrays) -> np.ndarray:
        env = dict(_FUNCS)
        for v in self.variables:
            env[v] = np.asarray(arrays[v], dtype=np.float64)
        return np.asarray(eval(self._code, {"__builtins__": {}}, env),
                          dtype=np.float64)


def function_score(searcher, query, expr: str,
                   feature_cols: list[str] | None = None):
    """FunctionScoreQuery: evaluate ``query`` hit-complete, fetch the
    expression's stored-field features for every hit, and rescore with
    the compiled expression. Returns (global doc_ids, new scores)."""
    feature_cols = feature_cols or []
    e = Expression(expr, ["score"] + feature_cols)
    docs, scores = searcher.search_all(query)
    if docs.shape[0] == 0:
        return docs, scores
    arrays = {"score": scores}
    if feature_cols:
        # fetch_docs returns rows IN REQUEST ORDER with ids missing from the
        # stored source dropped (and prepends id_col itself); missing
        # features default to 0.0 (DoubleValuesSource's advanceExact-miss
        # contract)
        id_col = searcher.manifest.get("id_col", "doc_id")
        fetched = searcher.fetch_docs(
            docs.tolist(), columns=list(feature_cols), on_missing="drop"
        )
        got_ids = fetched[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        found = np.isin(docs, got_ids)
        for c in feature_cols:
            vals = fetched[c].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.zeros(docs.shape[0], dtype=np.float64)
            out[found] = vals  # request-order alignment
            arrays[c] = out
    return docs, e.evaluate(**arrays)
