from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docker_aktin_dwh_spark.session import build_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


SCALE_REPLICAS = 3

#: canonicalized smoke-scale builder results, shared across modules in
#: one pytest session (suite-time guard): test_sql_surface computes
#: each ANSI key's builder frame at SF_SMOKE anyway (it runs first in
#: alphabetical module order), and test_t1_smoke only needs field/row
#: counts — re-running ~97 builders, several of them full streaming
#: replays, doubled that cost for no new signal.
BUILDER_CACHE: dict = {}


@pytest.fixture(scope="session")
def scale_dir(spark, tmp_path_factory):
    """One shared 3×-replica fixture of SF_SMOKE (scalegen) — used by
    the generator-invariant tests and the at-scale skew probes."""
    from docker_aktin_dwh_spark.scalegen import ensure_scale_fixture

    out = str(tmp_path_factory.mktemp("scalefix") / "r3")
    return ensure_scale_fixture(spark, SF_SMOKE, out, SCALE_REPLICAS)


@pytest.fixture(scope="session")
def spark():
    # 28 local cores / 14 sweep threads (was 16/8): the suite grew past
    # the 6-minute guard in r7 (623 tests) and the VM has 32 cores —
    # widening beyond this measured no further gain (saturated)
    s = build_session(app_name="tests", cpus=28, shuffle_partitions=8)
    yield s
    s.stop()


#: static cost hints for the sweep scheduler: the consolidated unions,
#: streaming replays and codec/pipeline keys dominate the critical
#: path — submitted FIRST so a 40-60 s union never starts after 150
#: cheap relational keys and straggles the whole pool (VERDICT r8
#: item 6: the suite-time guard; longest-job-first costs nothing in
#: coverage)
_SLOW_FIRST = ("r9b_all", "r9_all", "r8_all", "r7_all", "ext_all",
               "fin_all",
               "maint_all", "llm_all", "str_", "ivm", "pipe_", "ont_",
               "mm_", "ded_", "ann_", "er_0", "bm25", "ups_", "brk_",
               "src_0")


def _cost_rank(key: str) -> int:
    for i, p in enumerate(_SLOW_FIRST):
        if key.startswith(p):
            return i
    return len(_SLOW_FIRST)


def pooled_key_results(request, keys, run, max_workers=28):
    """Per-key sweep jobs through a thread pool, restricted to the keys
    whose parametrized tests were actually collected in this session —
    `-k some_key` computes one key, a full module run still gets pool
    wall-time (ADVICE r5: targeted debugging runs stay cheap).  Jobs
    are submitted longest-first (`_SLOW_FIRST` static cost hints) so
    the expensive unions bound the pool's wall time instead of
    straggling past it."""
    from concurrent.futures import ThreadPoolExecutor

    selected: set[str] = set()
    for item in request.session.items:
        if getattr(item, "module", None) is not request.module:
            continue
        cs = getattr(item, "callspec", None)
        if cs is not None and "key" in cs.params:
            selected.add(cs.params["key"])
    todo = [k for k in keys if k in selected] if selected else list(keys)
    todo.sort(key=_cost_rank)
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return dict(zip(todo, ex.map(run, todo)))
