"""Benchmark task algebra — the byTask ``.alg`` script driver role
(lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/
Benchmark.java:48,86; utils/Algorithm.java parses the script into a
TaskSequence tree; tasks/PerfTask.java is the task base;
tasks/TaskSequence.java runs sequential / parallel / rate-limited
groups).

Grammar subset (the constructs every shipped ``conf/*.alg`` uses):

* ``key=value`` property lines; ``#`` comments
* ``Task`` / ``Task(arg)`` — one task invocation
* ``{ "Name" ... }`` — SEQUENTIAL sequence; ``[ "Name" ... ]`` —
  PARALLEL group (each repeat is a concurrent worker)
* ``seq : N`` — repeat N times; ``: *`` — repeat until the content
  source is exhausted; ``: N : R/sec`` — rate-limit iterations
* ``>`` — closes a sequence like ``}`` with exhaust-on-empty
  semantics (the reference's background-sequence shorthand)

Scoped out (documented): ``&`` background groups and NewRound
multi-valued property iteration run the group inline / keep the first
value — the report layout is unchanged.

Execution adapts the reference's single-JVM threads to this engine:
AddDoc advances a cursor over a pre-loaded Arrow content table (the
ContentSource role — per-task Python touches an int, never a row);
CloseIndex builds the REAL index via index/build.build_index (Ray Data
does the actual work, so a parallel ``[AddDoc]`` group models ingest
partitioning, not a Python hot loop); Search runs the REAL query path
(search/searcher.Searcher). RepSumByName emits the per-task-name
(count, elapsed) table — counts are deterministic, elapsed is wall
time (report parity with ReportTask.java:60's summary table).
Fresh implementation — no reference code.
"""

from __future__ import annotations

import re
import threading
import time
from dataclasses import dataclass, field

__all__ = ["parse_alg", "run_alg", "AlgError"]


class AlgError(ValueError):
    pass


@dataclass
class Task:
    name: str
    arg: "str | None" = None


@dataclass
class Seq:
    name: str = ""
    children: list = field(default_factory=list)
    parallel: bool = False
    repeat: "int | None" = 1          # None = '*' (until exhausted)
    rate_per_sec: "float | None" = None
    exhaust: bool = False             # closed with '>'


_TOKEN = re.compile(r"""
    "(?P<qname>[^"]*)"            # quoted sequence name
  | (?P<ident>[A-Za-z_][\w.]*)    # task name
  | \((?P<arg>[^)]*)\)            # task argument
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<punct>[{}\[\]:*>&])
  | /sec
""", re.X)


def _strip_props(text: str) -> "tuple[dict, str]":
    """Property lines + comments out, script body kept. Multi-valued
    ``col:v1:v2:...`` properties keep the first value (NewRound
    iteration is scoped out)."""
    props: dict = {}
    body_lines = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = re.match(r"^\s*([\w.]+)\s*=\s*(.*)$", line)
        if m and not line.lstrip().startswith(("{", "[")):
            key, val = m.group(1), m.group(2).strip()
            parts = val.split(":")
            if len(parts) > 2 and not val.endswith("/sec"):
                val = parts[1]  # first value after the column label
            props[key] = val
        else:
            body_lines.append(line)
    return props, "\n".join(body_lines)


def parse_alg(text: str) -> "tuple[dict, Seq]":
    """Parse an ``.alg`` script -> (properties, root sequence)."""
    props, body = _strip_props(text)
    toks = []
    for m in _TOKEN.finditer(body):
        if m.group("qname") is not None:
            toks.append(("name", m.group("qname")))
        elif m.group("ident"):
            toks.append(("ident", m.group("ident")))
        elif m.group("arg") is not None:
            toks.append(("arg", m.group("arg")))
        elif m.group("num"):
            toks.append(("num", m.group("num")))
        elif m.group("punct"):
            toks.append((m.group("punct"), m.group("punct")))
        else:
            toks.append(("rate_unit", "/sec"))

    pos = 0

    def peek(k=0):
        return toks[pos + k] if pos + k < len(toks) else (None, None)

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_suffix(node):
        """``: N`` / ``: *`` / ``: N : R/sec`` after a task/sequence."""
        nonlocal pos
        if peek()[0] != ":":
            return node
        take()
        kind, val = peek()
        if kind == "num":
            take()
            reps: "int | None" = int(float(val))
        elif kind == "*":
            take()
            reps = None
        else:
            raise AlgError(f"expected count after ':', got {val!r}")
        rate = None
        if peek()[0] == ":":
            take()
            k2, v2 = take()
            if k2 != "num":
                raise AlgError("expected rate after second ':'")
            if peek()[0] == "rate_unit":
                take()
            rate = float(v2)
        if isinstance(node, Task):
            node = Seq(children=[node])
        node.repeat = reps
        node.rate_per_sec = rate
        return node

    def parse_group():
        nonlocal pos
        kind, _ = take()
        if kind not in ("{", "["):
            raise AlgError(f"expected '{{' or '[', got {kind!r}")
        seq = Seq(parallel=(kind == "["))
        if peek()[0] == "name":
            seq.name = take()[1]
        closer = "}" if kind == "{" else "]"
        while True:
            k, v = peek()
            if k is None:
                raise AlgError(f"unterminated sequence (missing {closer!r})")
            if k == closer:
                take()
                break
            if k == ">":
                take()
                seq.exhaust = True
                break
            seq.children.append(parse_node())
        node = parse_suffix(seq)
        if peek()[0] == "&":   # background groups run inline (scoped out)
            take()
        return node

    def parse_node():
        k, v = peek()
        if k in ("{", "["):
            return parse_group()
        if k == "ident":
            take()
            arg = None
            if peek()[0] == "arg":
                arg = take()[1]
            return parse_suffix(Task(v, arg))
        raise AlgError(f"unexpected token {v!r}")

    root = Seq(name="algorithm")
    while peek()[0] is not None:
        root.children.append(parse_node())
    return props, root


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

class _Exhausted(Exception):
    pass


class _Stats:
    """Per-task-name (count, elapsed) accumulation — RepSumByName."""

    def __init__(self):
        self.lock = threading.Lock()
        self.counts: dict = {}
        self.elapsed: dict = {}

    def add(self, name: str, dt: float, n: int = 1):
        with self.lock:
            self.counts[name] = self.counts.get(name, 0) + n
            self.elapsed[name] = self.elapsed.get(name, 0.0) + dt


def run_alg(text: str, tasks: dict, context: "dict | None" = None):
    """Execute a parsed script: ``tasks`` maps task name -> callable
    ``fn(ctx, arg)``; ``context`` seeds the shared mutable ctx dict
    (``ctx['props']`` gets the script properties). A task callable may
    raise StopIteration to signal content exhaustion, ending the
    nearest ``: *`` / ``>`` loop. Returns (report_rows, ctx) where
    report_rows = [(task_name, count, elapsed_sec)] sorted by name."""
    props, root = parse_alg(text)
    ctx = dict(context or {})
    ctx["props"] = props
    stats = _Stats()

    def run_task(t: Task):
        fn = tasks.get(t.name)
        if fn is None:
            raise AlgError(f"unknown task {t.name!r}")
        t0 = time.perf_counter()
        try:
            fn(ctx, t.arg)
        except StopIteration:
            raise _Exhausted()
        stats.add(t.name, time.perf_counter() - t0)

    def run_seq(s: Seq):
        if s.parallel:
            reps = 1 if s.repeat is None else s.repeat
            errs: list = []

            def worker():
                try:
                    for ch in s.children:
                        run_node(ch)
                except _Exhausted:
                    pass
                except Exception as e:      # surface real errors
                    errs.append(e)

            threads = [threading.Thread(target=worker) for _ in range(reps)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            if errs:
                raise errs[0]
            return
        i = 0
        interval = 1.0 / s.rate_per_sec if s.rate_per_sec else 0.0
        next_t = time.perf_counter()
        while s.repeat is None or i < s.repeat:
            if interval:
                now = time.perf_counter()
                if now < next_t:
                    time.sleep(next_t - now)
                next_t = max(next_t + interval, now)
            try:
                for ch in s.children:
                    run_node(ch)
            except _Exhausted:
                if s.repeat is None or s.exhaust:
                    break
                raise
            i += 1

    def run_node(n):
        if isinstance(n, Task):
            run_task(n)
        else:
            run_seq(n)

    try:
        run_seq(root)
    except _Exhausted:
        pass
    rows = [(name, stats.counts[name], round(stats.elapsed[name], 6))
            for name in sorted(stats.counts)]
    return rows, ctx


# ---------------------------------------------------------------------------
# Engine-bound default task registry
# ---------------------------------------------------------------------------

def engine_tasks(content_table, index_dir: str, queries=("table",),
                 analyzer=None, num_segments: int = 4) -> dict:
    """Task registry binding the script verbs to THIS engine — the
    tasks/ package role (CreateIndexTask, AddDocTask, ForceMergeTask,
    CloseIndexTask, SearchTask, ...). ``content_table`` is the
    ContentSource (a pyarrow Table with doc_id/text); AddDoc advances a
    shared atomic cursor (per-task cost = one int); CloseIndex builds
    the real index from the consumed slice via Ray Data; Search runs
    the real Searcher. Deterministic counts for any fixed content
    table, so a report is oracle-checkable."""

    cursor_lock = threading.Lock()

    def _reset(ctx, arg):
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        ctx.pop("searcher", None)
        ctx["cursor"] = 0
        ctx["force_merge"] = None

    def _create_index(ctx, arg):
        ctx["cursor"] = 0
        ctx["force_merge"] = None

    def _add_doc(ctx, arg):
        with cursor_lock:
            c = ctx.get("cursor", 0)
            if c >= content_table.num_rows:
                raise StopIteration
            ctx["cursor"] = c + 1

    def _force_merge(ctx, arg):
        ctx["force_merge"] = int(arg) if arg else 1

    def _close_index(ctx, arg):
        import shutil

        import ray.data

        from lucene_ray.index.build import build_index

        n = ctx.get("cursor", 0)
        if n == 0:
            return
        segs = ctx.get("force_merge") or num_segments
        ds = ray.data.from_arrow(content_table.slice(0, n))
        shutil.rmtree(index_dir, ignore_errors=True)  # cold build, no resume
        kw = {} if analyzer is None else {"analyzer": analyzer}
        build_index(ds, index_dir, num_segments=segs, **kw)

    def _open_reader(ctx, arg):
        from lucene_ray.search.searcher import Searcher

        ctx["searcher"] = Searcher(index_dir, mode="f64")

    def _search(ctx, arg):
        s = ctx.get("searcher")
        if s is None:
            _open_reader(ctx, None)
            s = ctx["searcher"]
        qi = ctx.get("query_i", 0)
        ctx["query_i"] = qi + 1
        s.search(queries[qi % len(queries)], k=10)

    def _noop(ctx, arg):
        return

    return {
        "ResetSystemErase": _reset,
        "ResetInputs": _create_index,
        "CreateIndex": _create_index,
        "OpenIndex": _create_index,
        "AddDoc": _add_doc,
        "ForceMerge": _force_merge,
        "Optimize": _force_merge,
        "CommitIndex": _noop,
        "CloseIndex": _close_index,
        "OpenReader": _open_reader,
        "CloseReader": _noop,
        "Search": _search,
        "NewRound": _noop,
        "RepSumByName": _noop,
        "RepSumByPref": _noop,
    }
