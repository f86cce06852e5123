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


def generate_corpus(
    n_repos: int = 10,
    files_per_repo: int = 20,
    seed: int = 42,
    n_modules: int = 12,
    n_classes: int = 15,
    n_funcs: int = 20,
    dup_file_share: float = 0.1,
):
    """Return (rows, truth) where rows are corpus-table dicts
    (repo, path, commit, lang, content, content_sha256)."""
    rng = random.Random(seed)
    truth = GroundTruth()

    modules = [f"mod{i}" for i in range(n_modules)]
    classes = [f"Cls{i}" for i in range(n_classes)]
    funcs = [f"fn{i}" for i in range(n_funcs)]

    # --- alias dictionary -------------------------------------------------
    # module aliases: two alias surface forms per canonical module
    for i, m in enumerate(modules):
        truth.alias_dict[f"module:m{i}x"] = (f"module:{m}", 1.0)
        truth.alias_dict[f"module:module{i}"] = (f"module:{m}", 0.9)
    # hot entity aliases: logf is called in a large share of files
    truth.alias_dict["func:log"] = ("func:logf", 1.0)
    truth.alias_dict["func:logger"] = ("func:logf", 0.8)
    # alias chains for canonicalization: helper{i}c -> helper{i}b -> helper{i}a
    for i in range(4):
        truth.alias_dict[f"func:helper{i}c"] = (f"func:helper{i}b", 0.7)
        truth.alias_dict[f"func:helper{i}b"] = (f"func:helper{i}a", 0.7)

    def module_form(i: int) -> str:
        return rng.choice([modules[i], f"m{i}x", f"module{i}"])

    def hot_call() -> str:
        return rng.choice(["logf", "log", "logger"])

    def helper_call() -> str:
        i = rng.randrange(4)
        return f"helper{i}{rng.choice('abc')}"

    # --- file content templates -------------------------------------------
    def render_python(repo, path):
        mi, mj = rng.sample(range(len(modules)), 2)
        cls, base = rng.sample(classes, 2)
        fn = rng.choice(funcs)
        calls = [hot_call() if rng.random() < 0.6 else rng.choice(funcs), helper_call()]
        content = (
            f'"""{repo}/{path}"""\n'
            f"import {module_form(mi)}\n"
            f"from {module_form(mj)} import stuff\n"
            f"\n"
            f"class {cls}({base}):\n"
            f"    pass\n"
            f"\n"
            f"def {fn}():\n"
            f"    {calls[0]}(1)\n"
            f"    {calls[1]}(x)\n"
        )
        fid = file_id(repo, path)
        # mentions recorded directly from the template choices (not re-parsed)
        mentions = []
        m_line1 = content.splitlines()[1].split()[1]
        m_line2 = content.splitlines()[2].split()[1]
        mentions.append((fid, "imports", f"module:{m_line1}"))
        mentions.append((fid, "imports", f"module:{m_line2}"))
        mentions.append((f"class:{cls}", "defined_in", fid))
        mentions.append((f"class:{cls}", "extends", f"class:{base}"))
        mentions.append((f"func:{fn}", "defined_in", fid))
        mentions.append((fid, "calls", f"func:{calls[0]}"))
        mentions.append((fid, "calls", f"func:{calls[1]}"))
        return content, mentions

    def render_java(repo, path):
        mi = rng.randrange(len(modules))
        cls, base = rng.sample(classes, 2)
        calls = [hot_call() if rng.random() < 0.6 else rng.choice(funcs)]
        mform = module_form(mi)
        content = (
            f"import {mform};\n"
            f"\n"
            f"public class {cls} extends {base} {{\n"
            f"    void run() {{\n"
            f"        {calls[0]}(1);\n"
            f"    }}\n"
            f"}}\n"
        )
        fid = file_id(repo, path)
        mentions = [
            (fid, "imports", f"module:{mform}"),
            (f"class:{cls}", "defined_in", fid),
            (f"class:{cls}", "extends", f"class:{base}"),
            (fid, "calls", f"func:{calls[0]}"),
        ]
        return content, mentions

    def render_go(repo, path):
        mi = rng.randrange(len(modules))
        fn = rng.choice(funcs)
        calls = [hot_call() if rng.random() < 0.6 else helper_call()]
        mform = module_form(mi)
        content = (
            f"package main\n"
            f"\n"
            f'import "{mform}"\n'
            f"\n"
            f"func {fn}() {{\n"
            f"    {calls[0]}(2)\n"
            f"}}\n"
        )
        fid = file_id(repo, path)
        mentions = [
            (fid, "imports", f"module:{mform}"),
            (f"func:{fn}", "defined_in", fid),
            (fid, "calls", f"func:{calls[0]}"),
        ]
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
            truth.raw_mentions.update(mentions)

    canon = truth.canonical_map()
    truth.triples = {
        (canon.get(s, s), p, canon.get(o, o)) for s, p, o in truth.raw_mentions
    }
    return rows, truth


def corpus_df(spark, rows):
    """Corpus rows → DataFrame with the canonical schema."""
    from kgw_spark.model import CORPUS_SCHEMA

    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
