"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Seeded generator emitting repos × files of template source code with
plantable entity mentions, giving exact ground-truth triples for P/R
scoring. Includes, by design:

- alias forms of the same entity (exercises entity linking),
- alias *chains* a←b←c (exercises connected-components canonicalization),
- one hot entity (``func:logf``) mentioned in a large share of files
  (exercises skew handling / salted joins),
- duplicate files across repos (exercises triple dedup, semantics of
  kgw/biomedicine/_oregano.py:226-245).

No external data; pure function of the seed.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

from kgw_spark.functions.extract_rules import file_id

LANGS = ["python", "java", "go"]


@dataclass
class GroundTruth:
    """What the pipeline must reproduce."""

    # alias dictionary used by the linking stage: alias_id -> (target_id, score)
    alias_dict: dict[str, tuple[str, float]] = field(default_factory=dict)
    # planted raw mentions per file BEFORE linking: (subj, pred, obj)
    raw_mentions: set[tuple[str, str, str]] = field(default_factory=set)
    # final canonical triples AFTER link + canonicalize + dedup
    triples: set[tuple[str, str, str]] = field(default_factory=set)

    def canonical_map(self) -> dict[str, str]:
        """Closure of the alias dictionary as connected components with
        lexicographic-min canonical ids — the convention the canonicalize
        stage implements (documented deviation from the reference's
        order-dependent first-seen dedup, SURVEY §7.4)."""
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, (b, _score) in self.alias_dict.items():
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in list(parent)}


def build_alias_dict(n_modules: int = 12) -> dict[str, tuple[str, float]]:
    """The deterministic entity-linking dictionary for a corpus with
    ``n_modules`` modules (depends on nothing else)."""
    alias: dict[str, tuple[str, float]] = {}
    # module aliases: two alias surface forms per canonical module
    for i in range(n_modules):
        alias[f"module:m{i}x"] = (f"module:mod{i}", 1.0)
        alias[f"module:module{i}"] = (f"module:mod{i}", 0.9)
    # hot entity aliases: logf is called in a large share of files
    alias["func:log"] = ("func:logf", 1.0)
    alias["func:logger"] = ("func:logf", 0.8)
    # alias chains for canonicalization: helper{i}c -> helper{i}b -> helper{i}a
    for i in range(4):
        alias[f"func:helper{i}c"] = (f"func:helper{i}b", 0.7)
        alias[f"func:helper{i}b"] = (f"func:helper{i}a", 0.7)
    return alias


def generate_corpus(
    n_repos: int = 10,
    files_per_repo: int = 20,
    seed: int = 42,
    n_modules: int = 12,
    n_classes: int = 15,
    n_funcs: int = 20,
    dup_file_share: float = 0.1,
    n_call_lines: int = 2,
    track_truth: bool = True,
):
    """Return (rows, truth) where rows are corpus-table dicts
    (repo, path, commit, lang, content, content_sha256).

    ``n_call_lines`` scales per-file body size (bench corpora use
    hundreds of call lines so extraction is compute-bound);
    ``track_truth=False`` skips ground-truth mention bookkeeping for
    large bench corpora (the alias dictionary is still returned)."""
    rng = random.Random(seed)
    truth = GroundTruth()

    modules = [f"mod{i}" for i in range(n_modules)]
    classes = [f"Cls{i}" for i in range(n_classes)]
    funcs = [f"fn{i}" for i in range(n_funcs)]

    truth.alias_dict = build_alias_dict(n_modules)

    # weighted call-target pool: ~20% hot entity, some helpers, rest funcs
    call_pool = (
        ["logf", "log", "logger"] * max(1, n_funcs // 10)
        + [f"helper{i}{c}" for i in range(4) for c in "abc"]
        + funcs
    )

    def module_form(i: int) -> str:
        return rng.choice([modules[i], f"m{i}x", f"module{i}"])

    def hot_call() -> str:
        return rng.choice(["logf", "log", "logger"])

    def helper_call() -> str:
        i = rng.randrange(4)
        return f"helper{i}{rng.choice('abc')}"

    def call_block() -> list[str]:
        """n_call_lines call targets: hot entity ~20% + helpers + funcs."""
        base = [hot_call() if rng.random() < 0.6 else rng.choice(funcs), helper_call()]
        if n_call_lines > 2:
            base += rng.choices(call_pool, k=n_call_lines - 2)
        return base[:n_call_lines] if n_call_lines >= 2 else base[:1]

    # --- file content templates -------------------------------------------
    def render_python(repo, path):
        mi, mj = rng.sample(range(len(modules)), 2)
        cls, base = rng.sample(classes, 2)
        fn = rng.choice(funcs)
        calls = call_block()
        body = "\n".join(f"    {c}(1)" for c in calls)
        m1, m2 = module_form(mi), module_form(mj)
        content = (
            f'"""{repo}/{path}"""\n'
            f"import {m1}\n"
            f"from {m2} import stuff\n"
            f"\n"
            f"class {cls}({base}):\n"
            f"    pass\n"
            f"\n"
            f"def {fn}():\n"
            f"{body}\n"
        )
        if not track_truth:
            return content, []
        fid = file_id(repo, path)
        mentions = [
            (fid, "imports", f"module:{m1}"),
            (fid, "imports", f"module:{m2}"),
            (f"class:{cls}", "defined_in", fid),
            (f"class:{cls}", "extends", f"class:{base}"),
            (f"func:{fn}", "defined_in", fid),
        ] + [(fid, "calls", f"func:{c}") for c in calls]
        return content, mentions

    def render_java(repo, path):
        mi = rng.randrange(len(modules))
        cls, base = rng.sample(classes, 2)
        calls = call_block()
        body = "\n".join(f"        {c}(1);" for c in calls)
        mform = module_form(mi)
        content = (
            f"import {mform};\n"
            f"\n"
            f"public class {cls} extends {base} {{\n"
            f"    void run() {{\n"
            f"{body}\n"
            f"    }}\n"
            f"}}\n"
        )
        if not track_truth:
            return content, []
        fid = file_id(repo, path)
        mentions = [
            (fid, "imports", f"module:{mform}"),
            (f"class:{cls}", "defined_in", fid),
            (f"class:{cls}", "extends", f"class:{base}"),
        ] + [(fid, "calls", f"func:{c}") for c in calls]
        return content, mentions

    def render_go(repo, path):
        mi = rng.randrange(len(modules))
        fn = rng.choice(funcs)
        calls = call_block()
        body = "\n".join(f"    {c}(2)" for c in calls)
        mform = module_form(mi)
        content = (
            f"package main\n"
            f"\n"
            f'import "{mform}"\n'
            f"\n"
            f"func {fn}() {{\n"
            f"{body}\n"
            f"}}\n"
        )
        if not track_truth:
            return content, []
        fid = file_id(repo, path)
        mentions = [
            (fid, "imports", f"module:{mform}"),
            (f"func:{fn}", "defined_in", fid),
        ] + [(fid, "calls", f"func:{c}") for c in calls]
        return content, mentions

    renderers = {"python": render_python, "java": render_java, "go": render_go}

    rows = []
    dup_pool: list[tuple[str, str, list]] = []  # (content, lang, mentions)
    for r in range(n_repos):
        repo = f"org{r % 3}/repo{r}"
        for f in range(files_per_repo):
            lang = LANGS[(r + f) % len(LANGS)]
            ext = {"python": "py", "java": "java", "go": "go"}[lang]
            path = f"src/f{f}.{ext}"
            if dup_pool and rng.random() < dup_file_share:
                content, lang, proto_mentions = rng.choice(dup_pool)
                ext = {"python": "py", "java": "java", "go": "go"}[lang]
                path = f"src/f{f}.{ext}"
                fid = file_id(repo, path)
                # re-anchor FILE-side mentions to the new file id
                proto_fid = proto_mentions[0][0] if proto_mentions else fid
                mentions = [
                    tuple(fid if part.startswith("file:") else part for part in m)
                    for m in proto_mentions
                ]
            else:
                content, mentions = renderers[lang](repo, path)
                dup_pool.append((content, lang, mentions))
            fid = file_id(repo, path)
            if track_truth:
                mentions = list(mentions) + [(fid, "in_repo", f"repo:{repo}")]
            commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                    "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
                }
            )
            if track_truth:
                truth.raw_mentions.update(mentions)

    if track_truth:
        canon = truth.canonical_map()
        truth.triples = {
            (canon.get(s, s), p, canon.get(o, o)) for s, p, o in truth.raw_mentions
        }
    return rows, truth


def corpus_df(spark, rows):
    """Corpus rows → DataFrame with the canonical schema."""
    from kgw_spark.model import CORPUS_SCHEMA

    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
