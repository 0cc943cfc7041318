"""Committed-artifact freshness gate (r13 verdict task 5).

PLANS.md already has a freshness gate; the committed BENCH-class
artifacts did not — the r12 loophole was four post-record commits whose
harmlessness only manual inspection established. This test closes it
mechanically: every artifact we record and commit ourselves
(SCALE100.json, SCALE_DOCS10.json, SOAK.json) must carry
``recorded_at_commit``, and either that commit IS HEAD or no commit
after it touches a module in the recording script's import closure
(so doc/test/artifact-only commits stay legal, while any change to code
a benched query can import forces a re-record).

The closure is a static walk of ``responsive_pub_spark`` imports from
the entry script — bench_scale imports the registry, whose closure is
effectively the whole package, which is exactly the point: if the
package changed, the numbers must be re-recorded.

Pure git/file assertions — no SparkSession.
"""

from __future__ import annotations

import json
import pathlib
import re
import subprocess

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = "responsive_pub_spark"

#: artifact -> the script whose run recorded it
ARTIFACTS = {
    "SCALE100.json": "bench_scale.py",
    "SCALE_DOCS10.json": "bench_scale.py",
    "SOAK.json": "bench_streaming.py",
}

_IMPORT_RE = re.compile(
    rf"^\s*(?:from\s+({PKG}(?:\.\w+)*)\s+import\s+([\w, ()*]+)"
    rf"|import\s+({PKG}(?:\.\w+)*))",
    re.M,
)


def _module_files(mod: str) -> list[pathlib.Path]:
    """Candidate repo files for a dotted module name (module file plus
    every package __init__ along the chain)."""
    parts = mod.split(".")
    out = []
    for i in range(1, len(parts) + 1):
        base = REPO / pathlib.Path(*parts[:i])
        if (base / "__init__.py").exists():
            out.append(base / "__init__.py")
        if base.with_suffix(".py").exists():
            out.append(base.with_suffix(".py"))
    return out


def _closure(entry: str) -> set[pathlib.Path]:
    seen: set[pathlib.Path] = set()
    stack = [REPO / entry]
    while stack:
        f = stack.pop()
        if f in seen or not f.exists():
            continue
        seen.add(f)
        text = f.read_text()
        for m in _IMPORT_RE.finditer(text):
            mod = m.group(1) or m.group(3)
            cand = _module_files(mod)
            if m.group(2):  # from X import a, b — a/b may be submodules
                for name in re.split(r"[,\s()]+", m.group(2)):
                    if name and name.isidentifier():
                        cand += _module_files(f"{mod}.{name}")
            stack.extend(cand)
    return seen


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


@pytest.mark.parametrize("artifact,entry", sorted(ARTIFACTS.items()))
def test_committed_artifact_is_fresh_or_benched_code_unchanged(
    artifact, entry
):
    path = REPO / artifact
    assert path.exists(), f"{artifact} missing"
    data = json.loads(path.read_text())
    commit = data.get("recorded_at_commit")
    assert commit, (
        f"{artifact} lacks recorded_at_commit — record it with "
        f"`python {entry} ... | tail -1 > {artifact}` (the script stamps "
        "HEAD itself)"
    )
    head = _git("rev-parse", "--short", "HEAD")
    if head.startswith(commit) or commit.startswith(head):
        return  # recorded at HEAD — trivially fresh
    try:
        changed = _git("diff", "--name-only", f"{commit}..HEAD").splitlines()
    except subprocess.CalledProcessError:
        pytest.fail(
            f"{artifact}: recorded_at_commit {commit} is not an ancestor "
            "of HEAD — re-record the artifact"
        )
    closure = {
        str(p.relative_to(REPO)) for p in _closure(entry)
    }
    stale = sorted(set(changed) & closure)
    assert not stale, (
        f"{artifact} is STALE: commits after {commit} touched benched "
        f"modules {stale}. Re-record with `python {entry} ... | tail -1 "
        f"> {artifact}` and commit the artifact in the same change."
    )


def test_latest_bench_artifact_was_recorded_fresh():
    """The BENCH_rN gate (r13 verdict task 4): the newest BENCH
    artifact must have been recorded at a tree from which no benched
    module changed before the artifact itself landed — the same
    invariant as the SCALE/SOAK gate, with the window ending at the
    commit that last touched the artifact (BENCH_rN is a per-round
    historical record re-recorded by the driver, so later code commits
    do not retroactively stale it; commits BETWEEN its recording and
    its landing do). bench.py stamps ``recorded_at_commit`` into its
    headline JSON from r14 on; the driver wraps that line under
    ``parsed``."""
    benches = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"BENCH_r0*(\d+)", p.name).group(1)),
    )
    assert benches, "no BENCH_rN.json committed"
    path = benches[-1]
    n = int(re.search(r"BENCH_r0*(\d+)", path.name).group(1))
    data = json.loads(path.read_text())
    parsed = data.get("parsed") or {}
    rec = parsed.get("recorded_at_commit") or data.get(
        "recorded_at_commit"
    )
    if rec is None:
        assert n <= 13, (
            f"{path.name} lacks recorded_at_commit — bench.py stamps it "
            "from r14 on; a missing stamp on a newer artifact means the "
            "stamping regressed"
        )
        pytest.skip("pre-r14 BENCH artifact predates the stamp")
    landed = _git("log", "-1", "--format=%H", "--", path.name)
    end = landed or "HEAD"
    try:
        changed = _git("diff", "--name-only", f"{rec}..{end}").splitlines()
    except subprocess.CalledProcessError:
        pytest.fail(
            f"{path.name}: recorded_at_commit {rec} is not an ancestor "
            f"of {end[:12]} — re-record the artifact"
        )
    closure = {str(p.relative_to(REPO)) for p in _closure("bench.py")}
    stale = sorted(set(changed) & closure)
    assert not stale, (
        f"{path.name} was STALE when it landed: commits between its "
        f"recording ({rec}) and its landing touched benched modules "
        f"{stale}."
    )


def test_closure_walk_reaches_the_registry():
    """Sanity on the gate's teeth: bench_scale's closure must include
    the registry (it dispatches every benched query through it) — an
    import-regex regression that silently emptied the closure would
    otherwise turn the gate into a no-op."""
    closure = {str(p.relative_to(REPO)) for p in _closure("bench_scale.py")}
    assert f"{PKG}/registry.py" in closure
    assert len(closure) > 20, sorted(closure)[:10]
