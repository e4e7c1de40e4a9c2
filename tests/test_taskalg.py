"""Benchmark task algebra (pipelines/taskalg.py) — parser unit tests
over the reference's conf/*.alg constructs plus an end-to-end run that
builds a real index and searches it."""

import threading
import time

import pyarrow as pa
import pytest

from lucene_ray.pipelines.taskalg import (AlgError, Seq, Task, engine_tasks,
                                          parse_alg, run_alg)


class TestParser:
    def test_props_and_comments(self):
        props, root = parse_alg(
            "# comment\nmerge.factor=mrg:10:100:10\nwork.dir=data\n"
            "{ \"Rounds\" AddDoc } : 3\n")
        assert props["work.dir"] == "data"
        # multi-valued property keeps the first value
        assert props["merge.factor"] == "10"
        (seq,) = root.children
        assert seq.name == "Rounds" and seq.repeat == 3

    def test_nested_parallel(self):
        _, root = parse_alg(
            '{ "Populate" CreateIndex [{ "MAddDocs" AddDoc } : 5000] : 4 '
            "ForceMerge(1) CloseIndex }")
        pop = root.children[0]
        assert [type(c) for c in pop.children] == [Task, Seq, Task, Task]
        par = pop.children[1]
        assert par.parallel and par.repeat == 4
        inner = par.children[0]
        assert inner.name == "MAddDocs" and inner.repeat == 5000
        fm = pop.children[2]
        assert fm.name == "ForceMerge" and fm.arg == "1"

    def test_exhaust_and_rate(self):
        _, root = parse_alg('[ "Indexing" { AddDoc > : * : 100/sec ] : 2 &')
        par = root.children[0]
        assert par.parallel and par.repeat == 2
        inner = par.children[0]
        assert inner.exhaust and inner.repeat is None
        assert inner.rate_per_sec == 100.0

    def test_star_repeat(self):
        _, root = parse_alg("{ AddDoc } : *")
        assert root.children[0].repeat is None

    def test_unterminated(self):
        with pytest.raises(AlgError):
            parse_alg("{ AddDoc ")

    def test_unknown_task_at_run(self):
        with pytest.raises(AlgError):
            run_alg("{ NoSuchTask }", {})


class TestRun:
    def test_counts_and_order(self):
        calls = []
        tasks = {"A": lambda ctx, a: calls.append("A"),
                 "B": lambda ctx, a: calls.append("B")}
        rows, _ = run_alg("{ A { B } : 3 } : 2", tasks)
        assert calls == ["A", "B", "B", "B"] * 2
        assert rows[0][:2] == ("A", 2) and rows[1][:2] == ("B", 6)

    def test_exhaustion_ends_star_loop(self):
        n = {"left": 5}

        def feed(ctx, a):
            if n["left"] == 0:
                raise StopIteration
            n["left"] -= 1

        rows, _ = run_alg("{ AddDoc } : *", {"AddDoc": feed})
        assert rows == [("AddDoc", 5, rows[0][2])]

    def test_parallel_shares_exhaustible_feed(self):
        lock = threading.Lock()
        n = {"left": 100}

        def feed(ctx, a):
            with lock:
                if n["left"] == 0:
                    raise StopIteration
                n["left"] -= 1

        rows, _ = run_alg('[ { AddDoc } : * ] : 4', {"AddDoc": feed})
        assert rows[0][:2] == ("AddDoc", 100)

    def test_rate_limit_paces(self):
        t0 = time.perf_counter()
        run_alg("{ T } : 5 : 100/sec", {"T": lambda c, a: None})
        # 5 iterations at 100/sec >= ~40 ms
        assert time.perf_counter() - t0 >= 0.035

    def test_task_arg_passed(self):
        got = []
        run_alg("{ ForceMerge(7) }", {"ForceMerge": lambda c, a: got.append(a)})
        assert got == ["7"]


class TestEngineTasks:
    def test_end_to_end(self, tmp_path, ray_session):
        tbl = pa.table({
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array([f"table scan row {i} value" for i in range(60)]),
        })
        tasks = engine_tasks(tbl, str(tmp_path / "alg_idx"),
                             queries=("table", "value"))
        script = """
{ "Rounds"
    ResetSystemErase
    { "Populate" CreateIndex [ { AddDoc } : * ] : 3 ForceMerge(2) CloseIndex }
    OpenReader
    { "Searching" Search } : 4
    NewRound
} : 2
RepSumByName
"""
        rows, ctx = run_alg(script, tasks)
        d = {name: cnt for name, cnt, _t in rows}
        assert d["AddDoc"] == 120          # 60 docs x 2 rounds
        assert d["Search"] == 8            # 4 x 2 rounds
        assert d["CloseIndex"] == 2 and d["CreateIndex"] == 2
        assert (tmp_path / "alg_idx" / "manifest.json").exists()
