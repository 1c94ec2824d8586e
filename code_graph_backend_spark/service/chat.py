"""/chat text→query compiler (reference api/llm.py:25-267, api/prompts.py).

The reference ships the graph ontology plus prompt contract to an LLM that
emits an OpenCypher statement, executes it, and summarizes. This module is
the deterministic equivalent of the GENERATION step: a question compiles to
a `ChatPlan` — an intent over the same ontology (labels, relationship
types, properties) — and the service executes the plan through the same
public operators every other endpoint uses. Swapping this matcher for an
LLM is a driver-side concern; the execution contract (plan in, DataFrame
out) is identical, and `ChatPlan.query` carries the Cypher-equivalent text
for transparency just as the reference returns its generated Cypher.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
from dataclasses import dataclass, field

# ontology labels (reference api/llm.py ontology; SURVEY §1.2)
_LABELS = {
    "function": "Function", "functions": "Function",
    "method": "Method", "methods": "Method",
    "class": "Class", "classes": "Class",
    "interface": "Interface", "interfaces": "Interface",
    "struct": "Struct", "structs": "Struct",
    "enum": "Enum", "enums": "Enum",
    "file": "File", "files": "File",
    "constructor": "Constructor", "constructors": "Constructor",
    "commit": "Commit", "commits": "Commit",
}


@dataclass
class ChatPlan:
    intent: str
    args: dict = field(default_factory=dict)
    query: str = ""  # Cypher-equivalent text (transparency, like the LLM path)


def _entity_name(q: str) -> str | None:
    """The subject name: quoted token first, else the identifier after
    of/call(s)/calling/defined."""
    m = re.search(r"['\"`]([\w.]+)['\"`]", q)
    if m:
        return m.group(1)
    m = re.search(r"(?:of|calls|call|calling|does|is|implements?|extends?|inherits? from)\s+(?:the\s+)?([A-Za-z_]\w*)\s*(?:\(\s*\))?(?:\s|\?|$)", q)
    if m and m.group(1).lower() not in _LABELS and m.group(1).lower() not in (
        "there", "many", "the", "a", "an", "it", "this", "defined",
    ):
        return m.group(1)
    return None


def _label_in(q: str) -> str | None:
    for word, label in _LABELS.items():
        if re.search(rf"\b{word}\b", q):
            return label
    return None


# Intents the dispatcher (service/api.py `chat`) can execute; an external
# LLM (see `_llm_compile`) may only emit these — anything else falls back
# to the deterministic rules.
VALID_INTENTS = frozenset({
    "count_label", "count_nodes", "count_edges", "count_commits",
    "unreachable", "most_called", "paths", "callers", "callees",
    "defined_in", "prefix_search", "name_contains", "list_commits",
    "list_label", "extends", "implements", "least_covered",
    "entities_in_file",
})

# Ontology summary shipped to the external LLM (mirrors the reference's
# ontology prompt, api/llm.py:25-235, compressed to the shapes our
# dispatcher executes).
LLM_PROMPT = (
    "You translate questions about a code property graph into ONE JSON "
    "object on the last line: {\"intent\": <intent>, \"args\": {...}}.\n"
    "Node labels: File, Class, Function, Method, Interface, Enum, Struct, "
    "Constructor, Commit. Edge types: DEFINES, CALLS, EXTENDS, IMPLEMENTS, "
    "RETURNS, PARAMETERS, PARENT, CHILD.\n"
    f"Valid intents: {sorted(VALID_INTENTS)}.\n"
    "Args by intent: count_label{label}, unreachable{label}, "
    "most_called{k}, paths{src,dest}, callers{name}, callees{name}, "
    "defined_in{name}, prefix_search{prefix}, name_contains{label,text}, "
    "list_label{label,k}, extends{name}, implements{name}, "
    "least_covered{k}, entities_in_file{file,label}.\n"
    "Question: "
)


def _llm_compile(question: str) -> ChatPlan | None:
    """Optional LLM generation step (reference api/llm.py:237-267 ships the
    ontology to a hosted model). Gated behind $CODE_GRAPH_LLM_CMD — a shell
    command that reads the prompt on stdin and prints a JSON plan on its
    last stdout line. Command-shaped (not URL-shaped) so any local runner
    or API CLI plugs in without this engine assuming a vendor. Invalid or
    missing output falls back to the deterministic compiler — the LLM can
    only ever choose among the same executable intents."""
    cmd = os.environ.get("CODE_GRAPH_LLM_CMD")
    if not cmd:
        return None
    try:
        out = subprocess.run(
            cmd, shell=True, input=LLM_PROMPT + question,
            capture_output=True, text=True, timeout=60,
        ).stdout.strip()
        d = json.loads(out.splitlines()[-1])
        intent, args = d.get("intent"), d.get("args", {})
        if intent in VALID_INTENTS and isinstance(args, dict):
            return ChatPlan(intent, args, d.get("query", f"LLM:{intent}"))
    except Exception:
        pass
    return None


def compile_question(question: str) -> ChatPlan | None:
    """Question → ChatPlan, or None when no intent matches (the reference
    returns an empty completion then, api/prompts.py:57)."""
    llm_plan = _llm_compile(question)
    if llm_plan is not None:
        return llm_plan
    q = question.lower().strip()
    name = _entity_name(question)
    label = _label_in(q)

    if re.search(r"\bleast covered\b|\blowest coverage\b|\bworst coverage\b", q):
        return ChatPlan(
            "least_covered", {"k": 10},
            "MATCH (f:File) WHERE f.coverage_precentage IS NOT NULL "
            "RETURN f ORDER BY f.coverage_precentage LIMIT 10",
        )

    if re.search(r"\bimplements?\b|\bimplementations? of\b", q) and name:
        return ChatPlan(
            "implements", {"name": name},
            f"MATCH (c)-[:IMPLEMENTS]->(i {{name:'{name}'}}) RETURN c",
        )

    if re.search(r"\bextends?\b|\bsubclass(?:es)? of\b|\binherits? from\b", q) and name:
        return ChatPlan(
            "extends", {"name": name},
            f"MATCH (c)-[:EXTENDS]->(b {{name:'{name}'}}) RETURN c",
        )

    m = re.search(
        r"\b(functions?|classes|methods?|interfaces?|enums?|structs?)\b\s+"
        r"(?:defined\s+)?in\s+['\"`]?([\w./-]+\.\w+)['\"`]?", q)
    if m:
        lbl = _LABELS[m.group(1)] if m.group(1) in _LABELS else _LABELS.get(
            m.group(1).rstrip("s"), "Function")
        return ChatPlan(
            "entities_in_file", {"file": m.group(2), "label": lbl},
            f"MATCH (f:File {{name:'{m.group(2)}'}})-[:DEFINES]->(n:{lbl}) RETURN n",
        )

    if re.search(r"\bhow many\b|\bcount\b|\bnumber of\b", q):
        if label == "Commit" or "commit" in q:
            return ChatPlan("count_commits", {},
                            "MATCH (c:Commit) RETURN count(c)")
        if label:
            return ChatPlan("count_label", {"label": label},
                            f"MATCH (n:{label}) RETURN count(n)")
        if "edge" in q or "relationship" in q:
            return ChatPlan("count_edges", {}, "MATCH ()-[e]->() RETURN count(e)")
        return ChatPlan("count_nodes", {}, "MATCH (n) RETURN count(n)")

    if re.search(r"\bunreachable\b|\bnever called\b|\bnot called\b|\bdead code\b", q):
        return ChatPlan(
            "unreachable", {"label": label or "Function"},
            f"MATCH (n:{label or 'Function'}) WHERE not ()-[:CALLS]->(n) RETURN n",
        )

    if re.search(r"\bmost (?:called|used)\b|\busage count\b|\bmost popular\b", q):
        return ChatPlan(
            "most_called", {"k": 10},
            "MATCH ()-[:CALLS]->(f) WITH f, count(1) AS usage_count "
            "RETURN f ORDER BY usage_count DESC LIMIT 10",
        )

    m = re.search(r"\bpaths?\b.*\bfrom\b\s+['\"`]?([\w.]+)['\"`]?\s+to\s+['\"`]?([\w.]+)['\"`]?", question, re.I)
    if m:
        return ChatPlan(
            "paths", {"src": m.group(1), "dest": m.group(2)},
            f"MATCH p=(:Searchable {{name:'{m.group(1)}'}})-[:CALLS*]->"
            f"(:Searchable {{name:'{m.group(2)}'}}) RETURN p",
        )

    if re.search(r"\bwho calls\b|\bcallers? of\b|\bcalled by whom\b", q) and name:
        return ChatPlan(
            "callers", {"name": name},
            f"MATCH (caller)-[:CALLS]->(f {{name:'{name}'}}) RETURN caller",
        )

    if (re.search(r"\bwhat does\b.*\bcall\b|\bcallees? of\b", q) and name):
        return ChatPlan(
            "callees", {"name": name},
            f"MATCH (f {{name:'{name}'}})-[:CALLS]->(callee) RETURN callee",
        )

    if re.search(r"\bwhere is\b.*\bdefined\b|\bwhich file\b|\bdefined in\b", q) and name:
        return ChatPlan(
            "defined_in", {"name": name},
            f"MATCH (f:File)-[:DEFINES]->(e {{name:'{name}'}}) RETURN f",
        )

    m = re.search(r"(?:start(?:ing)? with|prefix)\s+['\"`]?(\w+)['\"`]?", q)
    if m:
        return ChatPlan(
            "prefix_search", {"prefix": m.group(1)},
            f"CALL db.idx.fulltext.queryNodes('Searchable', '{m.group(1)}*') LIMIT 10",
        )

    m = re.search(r"(?:contain(?:ing|s)?)\s+['\"`]?(\w+)['\"`]?", q)
    if m and label:
        return ChatPlan(
            "name_contains", {"label": label, "text": m.group(1)},
            f"MATCH (n:{label}) WHERE n.name CONTAINS '{m.group(1)}' RETURN n",
        )

    if re.search(r"\blist\b|\bshow\b|\bwhat\b.*\bare\b", q) and label:
        if label == "Commit":
            return ChatPlan("list_commits", {},
                            "MATCH (c:Commit) RETURN c ORDER BY c.date")
        return ChatPlan("list_label", {"label": label, "k": 100},
                        f"MATCH (n:{label}) RETURN n LIMIT 100")

    return None
