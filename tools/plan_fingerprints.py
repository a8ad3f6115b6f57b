#!/usr/bin/env python3
"""Mechanical changed-plan ⇒ rotation-prefix enforcement.

The rotation protocol says: any query whose PLAN changed in a round
must re-enter the driver-checked prefix (its old proof is invalid).
Rounds 8-9 applied that rule by hand from a human-maintained list and
slipped four refactor-touched queries in r09. This tool makes the rule
impossible to miss: every registry query gets a STATIC TRANSITIVE
SOURCE FINGERPRINT — a hash over the AST-normalized source of its plan
function plus every repo function/class/constant it transitively
references, plus its oracle SQL — committed to
``tools/plan_fingerprints.json`` with the round the fingerprint last
changed. ``tests/test_plan_fingerprints.py`` recomputes the
fingerprints on every pytest run and fails if

  1. any live fingerprint differs from the manifest (you refactored
     something and did not run ``--update``), or
  2. any query whose manifest round == the CURRENT round is not inside
     the first-50 driver prefix (you updated the manifest but did not
     give the query a prefix slot).

Static source hashing (rather than ``df.explain`` fingerprints) is
deliberate: it needs no Spark session, is immune to temp paths and
plan-object ids, and catches exactly the r09 slip class — a helper
extraction or signature change that leaves results identical but
invalidates the "unchanged plan" assumption. AST-normalizing via
``ast.unparse`` keeps comment/formatting churn out of the hash.

Usage:
    python tools/plan_fingerprints.py            # report drift
    python tools/plan_fingerprints.py --update   # stamp changes with
                                                 # the current round
    python tools/plan_fingerprints.py --baseline # (first run) stamp
                                                 # everything round-1
"""
from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import os
import sys
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MANIFEST = os.path.join(REPO, "tools", "plan_fingerprints.json")
PKG = "bow_hunter_pipeline_spark"

# --- transitive source walk -------------------------------------------

# qualname -> (normalized-source-hash, sorted dep qualnames)
_WALK_CACHE: dict[str, tuple[str, list[str]]] = {}


def _norm_source(obj) -> str:
    src = textwrap.dedent(inspect.getsource(obj))
    try:
        return ast.unparse(ast.parse(src))
    except SyntaxError:  # pragma: no cover - decorators on odd indents
        return src


def _is_repo_obj(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.startswith(PKG)


def _qualname(obj) -> str:
    return f"{obj.__module__}.{obj.__qualname__}"


def _unwrap(obj):
    """Peel pandas_udf / functools wrappers down to repo callables."""
    for attr in ("func", "__wrapped__"):
        inner = getattr(obj, attr, None)
        if inner is not None and callable(inner) and _is_repo_obj(inner):
            return inner
    return obj


def _const_token(name: str, value) -> str | None:
    """A hashable token for a referenced module-level constant (SQL
    strings, bit widths, column lists). Functions/classes/modules are
    walked instead; unrepr-able objects are identified by type only."""
    if isinstance(value, (str, int, float, bool, bytes, type(None))):
        return f"const:{name}={value!r}"
    if isinstance(value, (tuple, list, dict, set, frozenset)):
        try:
            return f"const:{name}={sorted(map(repr, value))!r}" if isinstance(
                value, (set, frozenset)
            ) else f"const:{name}={value!r}"
        except Exception:  # pragma: no cover
            return f"const:{name}:<{type(value).__name__}>"
    return f"opaque:{name}:<{type(value).__module__}.{type(value).__name__}>"


def _collect_refs(tree: ast.AST) -> tuple[set[str], set[tuple[str, str]], dict]:
    """Names read, (root name, attribute) pairs, and an alias
    environment built from import statements INSIDE the body
    (``from pkg import warehouse_tx as tx`` binds a local the
    function's ``__globals__`` never sees)."""
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    env: dict[str, object] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(
            node.value, ast.Name
        ):
            attrs.add((node.value.id, node.attr))
        elif isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith(PKG)
        ):
            for alias in node.names:
                if alias.name == "*":
                    continue
                try:
                    mod = importlib.import_module(node.module)
                    try:
                        v = getattr(mod, alias.name)
                    except AttributeError:
                        v = importlib.import_module(
                            f"{node.module}.{alias.name}"
                        )
                    env[alias.asname or alias.name] = v
                except ImportError:  # pragma: no cover
                    pass
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    try:
                        v = importlib.import_module(alias.name)
                        env[alias.asname or alias.name] = v
                    except ImportError:  # pragma: no cover
                        pass
    return names, attrs, env


def _resolve_and_walk(value, out: dict[str, str]) -> None:
    value = _unwrap(value)
    if isinstance(value, types.ModuleType):
        return  # attributes on it are resolved individually
    if inspect.isfunction(value) or inspect.isclass(value):
        if _is_repo_obj(value):
            _walk(value, out)


def _walk(obj, out: dict[str, str]) -> None:
    """Depth-first over repo callables/classes reachable from obj,
    filling ``out`` with qualname -> source-hash (plus const tokens)."""
    q = _qualname(obj)
    if q in out:
        return
    try:
        src = _norm_source(obj)
    except (OSError, TypeError):  # builtins or C-level: identity only
        out[q] = "nosource"
        return
    out[q] = hashlib.sha256(src.encode()).hexdigest()

    tree = ast.parse(src)
    names, attrs, env = _collect_refs(tree)
    g = getattr(obj, "__globals__", None)
    if g is None and inspect.isclass(obj):
        g = vars(sys.modules.get(obj.__module__, types.ModuleType("x")))
    g = g or {}

    def _lookup(n):
        if n in env:
            return env[n]
        return g.get(n)

    for n in sorted(names):
        v = _lookup(n)
        if v is None and n not in env and n not in g:
            continue
        if isinstance(v, types.ModuleType):
            continue
        if inspect.isfunction(_unwrap(v)) or inspect.isclass(v):
            _resolve_and_walk(v, out)
        else:
            tok = _const_token(n, v)
            if tok is not None:
                key = f"{obj.__module__}.{n}"
                out.setdefault(key, hashlib.sha256(tok.encode()).hexdigest())
    for root, attr in sorted(attrs):
        v = _lookup(root)
        if isinstance(v, types.ModuleType) and v.__name__.startswith(PKG):
            try:
                _resolve_and_walk(getattr(v, attr), out)
            except AttributeError:
                pass
    for n, v in sorted(env.items(), key=lambda kv: kv[0]):
        if not isinstance(v, types.ModuleType):
            _resolve_and_walk(v, out)

    # class bodies: walk methods too (their deps matter)
    if inspect.isclass(obj):
        for _, m in sorted(inspect.getmembers(obj, inspect.isfunction)):
            if _is_repo_obj(m):
                _walk(m, out)


def compute_fingerprints() -> dict[str, str]:
    from bow_hunter_pipeline_spark import registry

    fps: dict[str, str] = {}
    for name, (fn, oracle) in registry._REGISTRY.items():
        out: dict[str, str] = {}
        _walk(_unwrap(fn), out)
        payload = json.dumps(
            {"deps": dict(sorted(out.items())), "oracle": oracle},
            sort_keys=True,
        )
        fps[name] = hashlib.sha256(payload.encode()).hexdigest()
    return fps


# --- manifest ----------------------------------------------------------


def load_manifest() -> dict:
    if not os.path.exists(MANIFEST):
        return {"round": 0, "queries": {}}
    with open(MANIFEST) as fh:
        return json.load(fh)


def diff(manifest: dict, live: dict[str, str]) -> dict[str, str]:
    """name -> 'added' | 'changed' | 'removed'."""
    entries = manifest.get("queries", {})
    d: dict[str, str] = {}
    for name, fp in live.items():
        if name not in entries:
            d[name] = "added"
        elif entries[name]["fp"] != fp:
            d[name] = "changed"
    for name in entries:
        if name not in live:
            d[name] = "removed"
    return d


def main(argv: list[str]) -> int:
    from bow_hunter_pipeline_spark import registry

    rnd = registry.ROUND
    live = compute_fingerprints()
    manifest = load_manifest()
    d = diff(manifest, live)

    if "--baseline" in argv:
        baseline_round = rnd - 1  # everything currently driver-proven
        manifest = {
            "round": rnd,
            "queries": {
                n: {"fp": fp, "round": baseline_round}
                for n, fp in sorted(live.items())
            },
        }
        with open(MANIFEST, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        print(f"baselined {len(live)} queries at round {baseline_round}")
        return 0

    if not d:
        if "--update" in argv and manifest.get("round") != rnd:
            # round rollover with zero plan drift: stamp the new round
            # so test_manifest_round_not_stale sees a current manifest
            manifest["round"] = rnd
            with open(MANIFEST, "w") as fh:
                json.dump(manifest, fh, indent=1, sort_keys=True)
            print(f"round rolled to {rnd}; fingerprints unchanged")
        print(f"clean: {len(live)} fingerprints match the manifest")
        return 0

    if "--update" in argv:
        entries = manifest.get("queries", {})
        for name, what in sorted(d.items()):
            if what == "removed":
                entries.pop(name, None)
            else:
                entries[name] = {"fp": live[name], "round": rnd}
            print(f"{what:>8}  {name}")
        manifest = {"round": rnd, "queries": dict(sorted(entries.items()))}
        with open(MANIFEST, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        changed = [n for n, w in d.items() if w != "removed"]
        print(
            f"\nstamped {len(changed)} queries round {rnd} — each MUST now "
            "(a) re-verify: python tools/verify_driver.py " + " ".join(changed[:6])
            + (" ..." if len(changed) > 6 else "")
            + "\n           and python tools/audit_oracle_types.py <same>"
            "\n(b) hold a slot in the first-50 driver prefix "
            "(tests/test_plan_fingerprints.py enforces this)."
        )
        return 0

    for name, what in sorted(d.items()):
        print(f"{what:>8}  {name}")
    print(
        f"\n{len(d)} fingerprint(s) drifted from tools/plan_fingerprints.json."
        "\nRun: python tools/plan_fingerprints.py --update, re-verify the"
        "\nlisted queries, and give them prefix slots."
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
