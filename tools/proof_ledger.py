"""Changed-since-proof ledger (VERDICT r04 task 3).

Problem this closes: a query can be rewritten AFTER its last
driver-green round (commit 5014681 did exactly that to
q_latest_snapshot and x28_dataset_build post-r03), leaving the
cumulative ledger claiming a proof that no longer covers the shipped
code. The ledger records, per driver-proven query, a content hash of
its implementing code at ledger-write time; a CI test
(tests/test_driver_window.py::test_changed_queries_are_in_window)
fails when a ledgered query's hash drifts and the query is NOT in the
current DRIVER_WINDOW — forcing every rewrite to either re-enter the
window for re-proof or go through an explicit, graded ledger refresh.

Hash closure: the catalog query function's source + its oracle SQL +
the source of every function/class defined in this package reachable
from it (transitive, via co_names/globals resolution). Foundational
modules (io.load_table etc.) are therefore part of most queries'
hashes ON PURPOSE: an io-layer change really does change every plan.
For such broad changes the remedy is `accept-local` below, which
re-hashes entries but downgrades their evidence grade to
"local-oracle" — visible in the JSON, so driver proof and local-only
proof are never conflated.

CLI:
  python -m tools.proof_ledger update CORRECTNESS_r05.json r05
      refresh hash + proven-round for every green row of that file
  python -m tools.proof_ledger rehash --baseline REF <reason...>
      refresh impl_hashes after upgrading the hash FUNCTION itself
      (code unchanged, measurement changed). --baseline is REQUIRED:
      the ref the ledgered proofs were computed at (the round-stamp
      commit). Each drifted entry is re-measured by the CURRENT
      tracer over that ref's package code (throwaway git worktree);
      only entries whose code is bit-identical since the proofs
      auto-refresh — the rest are real code drift, listed for
      accept-local / window re-admission. Proven rounds and evidence
      grades untouched, reason recorded per entry; only run right
      after a green full-catalog verify
  python -m tools.proof_ledger accept-local name [name ...]
      re-hash named entries after a foundational change, grading the
      evidence "local-oracle" (run tests/test_catalog_oracle.py green
      first; the grade is the audit trail)
"""

from __future__ import annotations

import hashlib
import inspect
import json
import sys
import types
from pathlib import Path

LEDGER_PATH = Path(__file__).resolve().parent / "proof_ledger.json"
PACKAGE = "stock_market_etl_spark"


def _package_callables(fn) -> list:
    """Functions/classes from our package reachable from ``fn``'s code:
    direct globals plus one attribute hop through package modules
    (catalog fns call ``dedup.exact_dedup`` via the module alias),
    PLUS anything imported inside the function body (r11: body-level
    ``from ...io import read_snapshot`` binds a LOCAL, invisible to
    __globals__ — the blind spot that let an io.py read-path change
    slip past the drift test)."""
    out = []
    code = getattr(fn, "__code__", None)
    gl = getattr(fn, "__globals__", None)
    if code is None or gl is None:
        return out
    names = set(code.co_names)
    for name in names:
        obj = gl.get(name)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            if not obj.__name__.startswith(PACKAGE):
                continue
            for attr in names:  # co_names holds attribute names too
                sub = getattr(obj, attr, None)
                if callable(sub) and getattr(sub, "__module__", "").startswith(
                    PACKAGE
                ):
                    out.append(sub)
        elif callable(obj) and getattr(obj, "__module__", "").startswith(PACKAGE):
            out.append(obj)
    out.extend(_body_imports(fn))
    return out


def _body_imports(fn) -> list:
    """Package callables bound by import statements INSIDE ``fn``'s
    body (AST pass over the source; deferred imports are the catalog
    convention for io/operator helpers)."""
    import ast
    import importlib
    import importlib.util
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return []
    names = set(getattr(fn, "__code__").co_names)

    def _hop_module(sub) -> None:
        # body-imported MODULE (from ...operators import dedup, or
        # import pkg.io as io): hop its attributes by co_names, same
        # as the global-module branch
        for attr in names:
            s2 = getattr(sub, attr, None)
            if callable(s2) and getattr(s2, "__module__", "").startswith(
                PACKAGE
            ):
                out.append(s2)

    out: list = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module is not None:
            # standard package-relative resolution (a hand-rolled
            # slice mis-resolves functions defined in a package
            # __init__ — review r11); the anchor is fn's module if it
            # IS a package, else its parent package
            base = getattr(fn, "__module__", "") or ""
            base_mod = sys.modules.get(base)
            anchor = (
                base
                if base_mod is not None and hasattr(base_mod, "__path__")
                else base.rpartition(".")[0]
            )
            prefix = "." * node.level + node.module
            try:
                mod_name = importlib.util.resolve_name(prefix, anchor)
            except (ImportError, ValueError):
                continue
            if not mod_name.startswith(PACKAGE):
                continue
            try:
                mod = importlib.import_module(mod_name)
            except ImportError:
                continue
            for alias in node.names:
                sub = getattr(mod, alias.name, None)
                if sub is None:
                    # `from pkg.operators import sessions` binds a
                    # SUBMODULE that is an attribute of the package
                    # only after something imported it — resolve it
                    # explicitly or the hash depends on import order
                    # (caught by a suite-order flake, r11)
                    try:
                        sub = importlib.import_module(
                            f"{mod_name}.{alias.name}"
                        )
                    except ImportError:
                        continue
                if isinstance(sub, types.ModuleType):
                    _hop_module(sub)
                elif callable(sub) and getattr(
                    sub, "__module__", ""
                ).startswith(PACKAGE):
                    out.append(sub)
        elif isinstance(node, ast.Import):
            # plain `import stock_market_etl_spark.io as sio` in the
            # body — the remaining blind spot of the same class
            for alias in node.names:
                if not alias.name.startswith(PACKAGE):
                    continue
                try:
                    _hop_module(importlib.import_module(alias.name))
                except ImportError:
                    continue
    return out


def impl_hash(name: str, queries: dict, oracles: dict) -> str:
    """sha256 over the query fn's source, its oracle SQL, and the
    transitive closure of package-internal callables it references."""
    fn = queries[name]
    seen: set[str] = set()
    sources: list[str] = [oracles.get(name, "")]
    stack = [fn]
    while stack:
        f = stack.pop()
        key = f"{getattr(f, '__module__', '')}.{getattr(f, '__qualname__', '')}"
        if key in seen:
            continue
        seen.add(key)
        try:
            sources.append(inspect.getsource(f))
        except (OSError, TypeError):
            continue
        stack.extend(_package_callables(f))
    # order-independent: qualname-sorted so dict/stack order can't drift
    sources.sort()
    return hashlib.sha256("\n".join(sources).encode()).hexdigest()[:16]


def load_ledger() -> dict:
    if LEDGER_PATH.exists():
        return json.loads(LEDGER_PATH.read_text())
    return {}


def save_ledger(ledger: dict) -> None:
    LEDGER_PATH.write_text(json.dumps(dict(sorted(ledger.items())), indent=1))


def _catalog():
    from stock_market_etl_spark.catalog import all_oracles, all_queries

    return all_queries(), all_oracles()


def cmd_update(correctness_file: str, round_tag: str) -> None:
    queries, oracles = _catalog()
    results = json.loads(Path(correctness_file).read_text())
    ledger = load_ledger()
    refreshed = []
    for name, row in results.items():
        green = (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            and row.get("err") is None
        )
        if green and name in queries:
            ledger[name] = {
                "proven": round_tag,
                "impl_hash": impl_hash(name, queries, oracles),
                "evidence": "driver",
            }
            refreshed.append(name)
    save_ledger(ledger)
    print(f"refreshed {len(refreshed)} entries from {correctness_file}")


def _package_hashes_at_ref(ref: str, names: list[str]) -> dict:
    """Hashes of the named entries computed by the CURRENT tracer
    over the PACKAGE CODE as of ``ref``: the ref is materialized in a
    throwaway git worktree and this module's ``impl_hash`` runs there
    in a subprocess — the worktree package on sys.path, the tracer
    loaded by file from THIS checkout. Measuring baseline and current
    code with the SAME (new) tracer is what makes the rehash
    classification sound: an old-tracer measurement would inherit
    exactly the blind spots the tracer upgrade exists to fix (review
    r12 — e.g. r11's body-import hole would have classified drift it
    couldn't see as 'tracer-only')."""
    import json as _json
    import subprocess
    import tempfile

    repo = Path(__file__).resolve().parent.parent
    tracer = repo / "tools" / "proof_ledger.py"
    with tempfile.TemporaryDirectory() as td:
        wt = str(Path(td) / "baseline")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd=repo,
            check=True,
            capture_output=True,
        )
        try:
            script = (
                "import importlib.util, json, sys\n"
                f"sys.path.insert(0, {wt!r})\n"
                "spec = importlib.util.spec_from_file_location("
                f"'cur_tracer', {str(tracer)!r})\n"
                "mod = importlib.util.module_from_spec(spec)\n"
                "spec.loader.exec_module(mod)\n"
                "from stock_market_etl_spark.catalog import "
                "all_queries, all_oracles\n"
                "q, o = all_queries(), all_oracles()\n"
                "names = json.loads(sys.argv[1])\n"
                "print(json.dumps({n: mod.impl_hash(n, q, o) "
                "for n in names if n in q}))\n"
            )
            out = subprocess.run(
                [sys.executable, "-c", script, _json.dumps(list(names))],
                cwd=wt,
                check=True,
                capture_output=True,
                text=True,
            )
            return _json.loads(out.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo,
                capture_output=True,
            )


def cmd_rehash(reason: list[str], baseline: str | None = None) -> None:
    """Refresh impl_hashes after upgrading the HASH FUNCTION itself
    (the code didn't change; the measurement did) WITHOUT touching
    proven round or evidence grade — but only where that story is
    provable. A blind refresh can't distinguish tracer-upgrade drift
    from real code drift run in the same round (ADVICE r11): a missed
    consumer of a code change would keep driver-grade evidence for
    never-re-proven code.

    ``--baseline`` is REQUIRED: the git ref the ledgered proofs were
    computed at (normally the round-stamp commit). Each drifted entry
    is re-measured by the CURRENT tracer over that ref's package code
    (`_package_hashes_at_ref`); baseline-hash == current-hash means
    the implementing code is bit-identical since the proofs, so the
    ledger delta is pure measurement change → refresh. Anything else
    is real code drift → left untouched and listed for accept-local
    or window re-admission. Both sides use the NEW tracer on purpose:
    comparing via the OLD tracer would inherit its blind spots — code
    drift the old tracer couldn't see would masquerade as
    tracer-only (review r12)."""
    if not reason:
        raise SystemExit("rehash requires a reason string")
    if baseline is None:
        raise SystemExit(
            "rehash requires --baseline REF — the ref the ledgered "
            "proofs were computed at (the round-stamp commit); "
            "a default would misclassify drift when the session's "
            "code changes are already committed"
        )
    note = " ".join(reason)
    queries, oracles = _catalog()
    ledger = load_ledger()
    # hash each entry ONCE — impl_hash runs a full trace of the query's
    # callee closure, so hashing in both the value and the filter
    # doubled an expensive full-catalog pass (ADVICE r12)
    current = {
        name: impl_hash(name, queries, oracles)
        for name in ledger
        if name in queries
    }
    drifted = {
        name: new
        for name, new in current.items()
        if new != ledger[name]["impl_hash"]
    }
    base = _package_hashes_at_ref(baseline, list(drifted)) if drifted else {}
    changed, code_drift = 0, []
    for name, new in drifted.items():
        if base.get(name) == new:
            ledger[name]["impl_hash"] = new
            ledger[name]["rehash_note"] = note
            changed += 1
        else:
            code_drift.append(name)
    save_ledger(ledger)
    print(f"rehashed {changed} tracer-only-drift entries ({note})")
    if code_drift:
        print(
            "REAL code drift (untouched — accept-local or re-admit "
            f"to the window): {' '.join(sorted(code_drift))}"
        )


def cmd_accept_local(names: list[str]) -> None:
    queries, oracles = _catalog()
    ledger = load_ledger()
    for name in names:
        entry = ledger.get(name)
        if entry is None:
            raise SystemExit(f"{name}: not in ledger (never driver-proven)")
        entry["impl_hash"] = impl_hash(name, queries, oracles)
        entry["evidence"] = "local-oracle"
    save_ledger(ledger)
    print(f"accepted {len(names)} entries at local-oracle grade")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "update":
        cmd_update(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 2 and sys.argv[1] == "accept-local":
        cmd_accept_local(sys.argv[2:])
    elif len(sys.argv) >= 2 and sys.argv[1] == "rehash":
        rest = sys.argv[2:]
        base = None
        if rest and rest[0] == "--baseline":
            if len(rest) < 2:
                raise SystemExit("--baseline requires a git ref")
            base = rest[1]
            rest = rest[2:]
        cmd_rehash(rest, baseline=base)
    else:
        raise SystemExit(__doc__)
