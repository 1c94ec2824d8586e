"""S2 (Java / C#): C-family source → PARSE_SCHEMA rows.

Reference pipeline (api/analyzers/java/analyzer.py:41-107,
csharp/analyzer.py:33-110): tree-sitter finds class/interface/enum/struct/
method/constructor declarations; symbol captures record base classes,
implemented interfaces, invocations, parameter and return types; the edge
mapping is base_class→EXTENDS, implement_interface→IMPLEMENTS,
extend_interface→EXTENDS, call→CALLS(line,text), parameters→PARAMETERS,
return_type→RETURNS (source_analyzer.py:156-169). Unresolved symbols are
skipped (source_analyzer.py:155-157) — no external nodes, unlike Python.

This implementation: the container has no tree-sitter, so declarations are
found with a brace-aware scanner over comment/string-stripped source —
offsets are preserved during stripping, so line numbers and nesting
(brace-depth + span containment) are exact. The heuristic parser is a
documented divergence in *mechanism*; the emitted row shape and label/edge
inventory match the reference. The kernels are pure functions: the Spark
entry point is the shared dispatching `parse_files` in source code —
mapInPandas over the binaryFile scan, one parse per file, no shuffle.
"""

from __future__ import annotations

import re

# -- language specs ----------------------------------------------------------

_JAVA_KEYWORDS = {
    "if", "for", "while", "switch", "catch", "return", "new", "super",
    "this", "throw", "do", "else", "case", "break", "continue", "assert",
    "synchronized", "try", "finally", "instanceof", "yield",
}
_CS_KEYWORDS = _JAVA_KEYWORDS | {
    "foreach", "lock", "using", "checked", "unchecked", "typeof", "nameof",
    "sizeof", "default", "when", "is", "as", "await", "get", "set", "add",
    "remove", "init", "base",
}
_MODIFIERS = {
    "public", "private", "protected", "internal", "static", "final",
    "abstract", "sealed", "virtual", "override", "async", "readonly",
    "partial", "extern", "unsafe", "native", "synchronized", "strictfp",
    "default", "transient", "volatile", "new", "const",
    # Java 17 sealed hierarchies: both are plain modifiers in
    # tree-sitter-java (the hyphen survives whitespace tokenization)
    "non-sealed",
}

_TYPE_DECL_RE = re.compile(
    r"\b(class|interface|enum|struct|record)\s+([A-Za-z_]\w*)"
)
# annotation with optional argument list (one nesting level inside the
# parens — enough after string literals are blanked)
_ANNOT_RE = re.compile(r"@[A-Za-z_][\w.]*(?:\s*\((?:[^()]|\([^()]*\))*\))?")
# annotation WITH an argument list only — used to blank annotation
# spans out of method bodies before call scanning (an argless
# `@Override` can't match the call regex anyway)
_ANNOT_ARGS_RE = re.compile(r"@[A-Za-z_][\w.]*\s*\((?:[^()]|\([^()]*\))*\)")
# C# attribute group(s) at the start of a parameter: `[FromBody] User u`
_CS_ATTR_PREFIX_RE = re.compile(r"^(?:\s*\[[^\[\]]*\])+")
# `ReturnType name(`: two identifier-ish tokens (the first possibly generic/
# array/dotted) separated by whitespace, immediately before an open paren.
# The generic section allows TWO levels of nesting (`Map<String,
# Map<String, List<Integer>>>`) — deeper nesting in a RETURN type is
# vanishingly rare and degrades to a missed method, not a wrong one. The
# alternation branches are disjoint on their first character and every
# repetition is bounded, so the scan stays linear on adversarial input.
#
# Group 2 is the FULL declared name, group 3 the simple name:
# - a dotted prefix admits C# explicit interface implementations
#   (`void IFoo.Bar()` — tree-sitter's method_declaration whose name
#   field is just `Bar` beside an explicit_interface_specifier);
#   dotted matches additionally REQUIRE a body downstream, which kills
#   the field-initializer false positive (`int x = Foo.Bar();`).
# - the optional `<...>` AFTER the name admits C# generic methods
#   (`T Get<T>(int i)` — type_parameter_list follows the name in
#   tree-sitter-c-sharp; Java puts type params before the return type
#   so Java declarations never produce it). The char class excludes
#   operators, so `a < b && c > (d)` can't read as type arguments.
_METHOD_RE = re.compile(
    r"([A-Za-z_][\w.$]*"
    r"(?:\s*<(?:[^<>;{}]|<(?:[^<>;{}]|<[^<>;{}]{0,60}>){0,60}>){0,80}>)?"
    r"(?:\s*\[\s*\])*[?]?)\s+"
    r"((?:[A-Za-z_][\w.]*\s*\.\s*)?([A-Za-z_]\w*))\s*"
    r"(?:<[\w\s,.?\[\]]{0,60}>)?\s*\("
)

# nested-aware `<...>` spans, for erasing generic parameter sections from
# type-declaration headers before inheritance-clause matching
_GENERIC_SPAN_RE = re.compile(r"<(?:[^<>]|<[^<>]*>)*>")
# the `~` in the lookbehind rejects C# destructors (`~Box()` is a
# destructor_declaration in tree-sitter, not constructor_declaration)
_CTOR_RE = re.compile(r"(?<![\w.$>\]~])([A-Za-z_]\w*)\s*\(")
# the optional `<...>` admits generic invocations (`repo.FetchAll<T>(ct)`,
# tree-sitter's invocation_expression with type arguments); the character
# class inside the angle brackets excludes operators so a comparison pair
# `a < b && c > (d)` can't be misread as a call with type arguments
_CALL_RE = re.compile(
    r"(?<![\w.$])(?:[\w.$\[\]]+\s*\.\s*)?([A-Za-z_]\w*)\s*"
    r"(?:<[\w\s,.?\[\]<>]{0,60}>)?\s*\("
)
# fluent-chain continuation: an invocation whose receiver is a call result
# (`stream().filter(...)`) — _CALL_RE's lookbehind rejects the `.` after
# `)`, so these are matched separately and unioned by callee offset
_CHAIN_CALL_RE = re.compile(r"\)\s*\.\s*([A-Za-z_]\w*)\s*\(")


def _blank_spans(text: str, regex: re.Pattern) -> str:
    """Space-fill every regex match, PRESERVING offsets (re.sub would
    shift every later call-site/line computation). The no-match common
    case returns the input untouched — this runs per method body."""
    out = None
    for m in regex.finditer(text):
        if out is None:
            out = list(text)
        for k in range(m.start(), m.end()):
            if out[k] != "\n":
                out[k] = " "
    return text if out is None else "".join(out)


def _scan_interpolated(
    source: str, out: list, k: int, verbatim: bool, start: int = -1
) -> int:
    """Blank a C# interpolated string starting AFTER its prefix+quote
    (offset k), leaving `{...}` interpolation holes intact — tree-sitter
    parses hole contents as real expressions (invocation_expression
    nodes inside $\"got {Get(x)}\" are call captures), while the literal
    text around them is string data. `{{`/`}}` are literal-brace
    escapes; nested strings inside holes are blanked by a mini scan.
    Verbatim mode ($@\"/@$\") treats backslash as text and \"\" as the
    quote escape. Blanks the prefix itself and returns the offset past
    the closing quote."""
    n = len(source)
    for kk in range(start if start >= 0 else k, k):
        if out[kk] != "\n":
            out[kk] = " "
    depth = 0
    while k < n:
        ch = source[k]
        if depth == 0:
            if not verbatim and ch == "\\" and k + 1 < n:
                out[k] = " "
                if out[k + 1] != "\n":
                    out[k + 1] = " "
                k += 2
                continue
            if ch == '"':
                if verbatim and k + 1 < n and source[k + 1] == '"':
                    out[k] = " "
                    out[k + 1] = " "
                    k += 2
                    continue
                out[k] = " "
                k += 1
                break
            if ch == "{":
                if k + 1 < n and source[k + 1] == "{":
                    out[k] = " "
                    out[k + 1] = " "
                    k += 2
                    continue
                depth = 1
                out[k] = " "
                k += 1
                continue
            if ch != "\n":
                out[k] = " "
            k += 1
        else:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    out[k] = " "
            elif ch == '"':
                # nested string inside the hole: blank it
                q = k + 1
                while q < n and source[q] != '"':
                    q += 2 if source[q] == "\\" else 1
                for kk in range(k, min(q + 1, n)):
                    if out[kk] != "\n":
                        out[kk] = " "
                k = q + 1
                continue
            k += 1
    return k


def _strip(source: str):
    """Blank out comments and string/char literals, preserving offsets.

    Returns (cleaned, comments) where comments is a list of
    (start, end, text, is_line) spans in the ORIGINAL source.
    """
    out = list(source)
    comments: list[tuple[int, int, str, bool]] = []
    i, n = 0, len(source)
    while i < n:
        c = source[i]
        nxt = source[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":
            j = source.find("\n", i)
            j = n if j < 0 else j
            comments.append((i, j, source[i:j], True))
            for k in range(i, j):
                out[k] = " "
            i = j
        elif c == "/" and nxt == "*":
            j = source.find("*/", i + 2)
            j = n if j < 0 else j + 2
            comments.append((i, j, source[i:j], False))
            for k in range(i, j):
                if out[k] != "\n":
                    out[k] = " "
            i = j
        elif source[i:i + 3] == '"""':
            # Java text block / C# raw string literal: content is string
            # text through the closing triple quote — internal single
            # quotes must not terminate it, and its content must never
            # read as code (an embedded SQL snippet's `foo(1)` is not a
            # call in tree-sitter's string_literal node either)
            j = source.find('"""', i + 3)
            j = n if j < 0 else j + 3
            for k in range(i, min(j, n)):
                if out[k] != "\n":
                    out[k] = " "
            i = j
        elif c == "@" and nxt == '"':  # C# verbatim string: "" escapes a quote
            j = i + 2
            while j < n:
                if source[j] == '"':
                    if j + 1 < n and source[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j + 1, n)):
                if out[k] != "\n":
                    out[k] = " "
            i = j + 1
        elif c == "$" and nxt == '"':
            i = _scan_interpolated(source, out, i + 2, verbatim=False, start=i)
        elif source[i:i + 3] in ('$@"', '@$"'):
            i = _scan_interpolated(source, out, i + 3, verbatim=True, start=i)
        elif c in ('"', "'"):
            q, j = c, i + 1
            while j < n and source[j] != q:
                j += 2 if source[j] == "\\" else 1
            for k in range(i, min(j + 1, n)):
                if out[k] != "\n":
                    out[k] = " "
            i = j + 1
        else:
            i = i + 1
    return "".join(out), comments


def _brace_match(cleaned: str) -> dict[int, int]:
    stack: list[int] = []
    match: dict[int, int] = {}
    for i, c in enumerate(cleaned):
        if c == "{":
            stack.append(i)
        elif c == "}" and stack:
            match[stack.pop()] = i
    return match


def _line_of(source: str, offset: int) -> int:
    return source.count("\n", 0, offset)


def _base_type_name(tok: str) -> str | None:
    """`List<Foo>[]...` / `System.Console` / `ref int` → base identifier.
    Java annotations (`@PathVariable("id") Long id`) and C# attribute
    groups (`[FromBody] User u`) are stripped first — their names and
    leftover argument parens must not shadow the actual type token."""
    tok = _ANNOT_RE.sub(" ", tok)
    tok = _CS_ATTR_PREFIX_RE.sub(" ", tok)
    # C# 12 primary-constructor base: `class Circle(double r) :
    # Shape(r)` — the trailing argument list is not part of the type
    # (tree-sitter: primary_constructor_base_type's type field)
    tok = re.sub(r"\((?:[^()]|\([^()]*\))*\)\s*$", " ", tok)
    tok = re.sub(r"<[^<>]*(?:<[^<>]*>[^<>]*)*>", "", tok)
    tok = tok.replace("[", " ").replace("]", " ").replace("?", " ")
    tok = tok.replace("...", " ")
    parts = [p for p in re.split(r"[\s]+", tok.strip()) if p]
    parts = [p for p in parts if p not in _MODIFIERS and p not in
             ("ref", "out", "in", "params", "this", "final", "var")
             and not p.startswith("@")]
    if not parts:
        return None
    name = parts[0].split(".")[-1]
    return name if re.fullmatch(r"[A-Za-z_]\w*", name) else None


def _split_params(params: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in params:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def _doc_before(source: str, comments, decl_start: int, line_doc: bool,
                cleaned: str | None = None) -> str | None:
    """Doc comment directly above a declaration.

    Java (reference java/analyzer.py:59-63): the adjacent block comment.
    C# (reference csharp/analyzer.py:57-67): the contiguous run of `//`
    lines directly above, joined with newlines.
    """
    gap_src = cleaned if cleaned is not None else source

    def _only_modifiers(gap: str) -> bool:
        # annotations/attributes may carry argument lists
        # (`@GetMapping("/x")`, `[HttpGet("x")]`) — strip them whole
        # before tokenizing, so a doc comment above an annotated decl is
        # still recognized as adjacent
        gap = _ANNOT_RE.sub(" ", gap)
        gap = re.sub(r"\[[^\[\]]*\]", " ", gap)
        return all(
            t in _MODIFIERS or t.startswith("@") or t.startswith("[")
            for t in gap.split()
        )

    chain: list[str] = []
    end_cursor = decl_start
    for start, end, text, is_line in reversed(comments):
        if end > end_cursor:
            continue
        # modifiers/annotations may sit between the doc comment and the
        # decl keyword the regex anchored on (`/** doc */ public class X`)
        if not _only_modifiers(gap_src[end:end_cursor]):
            break
        if line_doc != is_line:
            break
        chain.insert(0, text)
        end_cursor = start
        if not line_doc:
            break  # Java: single adjacent block comment
    return "\n".join(chain) if chain else None


def _parse_cfamily(path: str, source: str, lang: str) -> list[tuple]:
    """Shared Java/C# kernel → PARSE_SCHEMA tuples (see python_analyzer)."""
    is_cs = lang == "cs"
    keywords = _CS_KEYWORDS if is_cs else _JAVA_KEYWORDS
    cleaned, comments = _strip(source)
    braces = _brace_match(cleaned)
    rows: list[tuple] = []
    src_lines = source.splitlines()

    # ---- type declarations (+ their body spans) ----------------------------
    types = []  # (kind, name, decl_off, open_off, close_off)
    anno_iface_bodies: set[int] = set()  # `{` offsets of skipped @interface bodies
    for m in _TYPE_DECL_RE.finditer(cleaned):
        kind, name = m.group(1), m.group(2)
        scan_from = m.end()
        if kind == "record" and is_cs and name in ("struct", "class"):
            # C# 10 `record struct P(...)` / `record class C(...)`: the
            # keyword after `record` is the kind, the NAME follows it
            # (tree-sitter: record_struct_declaration / record_declaration)
            mm2 = re.match(r"\s*([A-Za-z_]\w*)", cleaned[m.end():])
            if not mm2:
                continue
            kind = "record_struct" if name == "struct" else "record"
            name = mm2.group(1)
            scan_from = m.end() + mm2.end()
        if kind == "struct" and not is_cs:
            continue
        if is_cs and kind in ("class", "struct"):
            # generic-constraint TARGET, not a declaration: in
            # `where T : class` / `where T : struct` the keyword is
            # preceded by `:` (or `,` in a constraint list), and when it
            # sits at line end the next line's first word would be
            # captured as a phantom type name (`where T1 : class\n
            # where T2 : ...` → "Class where"). tree-sitter parses these
            # as type_parameter_constraint, never a declaration.
            k = m.start() - 1
            while k >= 0 and cleaned[k].isspace():
                k -= 1
            if k >= 0 and cleaned[k] in ":,":
                continue
        if kind == "interface":
            # Java `@interface X` is an annotation_type_declaration in
            # tree-sitter, NOT interface_declaration — the reference emits
            # no entity for it (java/analyzer.py:68), and its element
            # "methods" (`int value() default 0;`) are filtered out by the
            # body-depth check once the decl itself is skipped
            k = m.start() - 1
            while k >= 0 and cleaned[k].isspace():
                k -= 1
            if k >= 0 and cleaned[k] == "@":
                # remember the body span: inside an ENUM, the constant-body
                # pass would otherwise read `@interface Meta {` as a
                # constant body (open brace preceded by an identifier) and
                # admit its brace-defaulted elements
                # (`int[] nums() default { 1, 2 };`) as enum methods
                ao = cleaned.find("{", m.end())
                if ao >= 0 and ao in braces:
                    anno_iface_bodies.add(ao)
                continue
        open_off = cleaned.find("{", scan_from)
        if kind in ("record", "record_struct"):
            semi = cleaned.find(";", scan_from)
            # C# positional record without a body: zero-length body span
            if semi >= 0 and (open_off < 0 or semi < open_off):
                types.append((kind, name, m.start(), semi, semi))
                continue
        if open_off < 0 or open_off not in braces:
            continue
        types.append((kind, name, m.start(), open_off, braces[open_off]))

    def enclosing_type(off: int):
        best = None
        for t in types:
            if t[3] < off <= t[4]:
                if best is None or t[3] > best[3]:
                    best = t
        return best

    label_of = {"class": "Class", "interface": "Interface",
                "enum": "Enum", "struct": "Struct",
                # records are final classes with value semantics — same
                # label the reference's class capture would produce;
                # `record struct` is a value type → Struct
                "record": "Class", "record_struct": "Struct"}

    # type entity rows are emitted AFTER method discovery: a local
    # class/record declared inside a method body is DEFINES-parented at
    # the METHOD (the reference's create_entity_hierarchy parents every
    # entity at its nearest enclosing entity of any captured kind,
    # source_analyzer.py:44-58), and methods aren't known yet here
    pending_types = []  # (kind, name, decl_off, start, end, doc, parent)
    for kind, name, decl_off, open_off, close_off in types:
        parent = enclosing_type(decl_off)
        start = _line_of(source, decl_off)
        end = _line_of(source, close_off)
        doc = _doc_before(source, comments, decl_off, line_doc=is_cs, cleaned=cleaned)
        pending_types.append((kind, name, decl_off, start, end, doc, parent))

        # ---- inheritance clause -------------------------------------------
        # Generic parameter sections are erased first: `class Box<T extends
        # Number>` must not read its BOUND as an inheritance clause, and
        # `extends Base<T>` must match on the erased name. C# `where`
        # constraint clauses are cut for the same reason.
        header = _GENERIC_SPAN_RE.sub("", cleaned[decl_off:open_off])
        # clauses that follow the inheritance list must not read as
        # inheritance targets: C# generic `where` constraints; Java 17
        # `permits` lists (tree-sitter-java: a `permits` node, never
        # superclass/super_interfaces — reference java/analyzer.py:72-86)
        header = re.split(r"\bwhere\b" if is_cs else r"\bpermits\b", header)[0]
        if is_cs:
            # `name : Base, IFoo` — first base of a CLASS is by convention the
            # base class; everything else implements (csharp/analyzer.py:76-95)
            mm = re.search(r":\s*(.+)$", header, re.S)
            if mm:
                bases = [_base_type_name(b) for b in _split_params(mm.group(1))]
                bases = [b for b in bases if b]
                for pos, b in enumerate(bases):
                    if kind in ("class", "record"):
                        # C# syntax can't distinguish base class from first
                        # interface (reference csharp/analyzer.py:80-87 NOTE);
                        # `cs_base` defers the EXTENDS-vs-IMPLEMENTS decision
                        # to the resolution join, where the target's label is
                        # known — the correction the reference delegates to LSP.
                        k = "cs_base" if pos == 0 else "implements"
                    elif kind == "interface":
                        k = "extends"
                    else:  # struct: interfaces only
                        k = "implements"
                    rows.append((k, None, name, path, start, end, None,
                                 None, None, b, None, None))
        else:
            ext = re.search(r"\bextends\b(.*?)(?:\bimplements\b|$)", header, re.S)
            imp = re.search(r"\bimplements\b(.*)$", header, re.S)
            if ext:
                for b in _split_params(ext.group(1)):
                    bn = _base_type_name(b)
                    if bn:
                        rows.append(("extends", None, name, path, start, end,
                                     None, None, None, bn, None, None))
            if imp and kind in ("class", "record"):
                for b in _split_params(imp.group(1)):
                    bn = _base_type_name(b)
                    if bn:
                        rows.append(("implements", None, name, path, start, end,
                                     None, None, None, bn, None, None))

    # ---- methods / constructors -------------------------------------------
    depth = 0
    depth_at = [0] * (len(cleaned) + 1)
    for i, c in enumerate(cleaned):
        depth_at[i] = depth
        if c == "{":
            depth += 1
        elif c == "}":
            depth = max(0, depth - 1)
    depth_at[len(cleaned)] = depth

    def body_depth(t) -> int:
        return depth_at[t[3]] + 1

    def _is_delegate_decl(start: int) -> bool:
        # `public delegate int D<T>(T x);` is a delegate_declaration in
        # tree-sitter, never a method entity — reject when the word
        # directly before the return type is `delegate`
        mm = re.search(r"(\w+)\s*$", cleaned[max(0, start - 40):start])
        return bool(mm and mm.group(1) == "delegate")

    methods = []  # (name, decl_off, header_end, body_open|None, body_close|None, ret, params_txt, owner)
    seen_offsets: set[int] = set()
    for m in _METHOD_RE.finditer(cleaned):
        ret, name = m.group(1), m.group(3)
        dotted = "." in m.group(2)
        ret_base = ret.split("<")[0].split(".")[-1].strip()
        if ret_base in keywords or name in keywords or ret_base in _MODIFIERS:
            continue  # `public Task(` is a constructor, not a method `Task`
        if ret_base in ("record", "struct", "class"):
            # `record Point(int x)` / `record struct P(int x)` headers
            # are type declarations, never methods (struct/class are
            # reserved and cannot be return types)
            continue
        if ret_base == "operator":
            # `implicit operator string(...)` is a conversion_operator_
            # declaration in tree-sitter — no method entity
            continue
        if dotted and not is_cs:
            continue  # explicit interface implementation is C#-only
        if is_cs and _is_delegate_decl(m.start(1)):
            continue
        owner = enclosing_type(m.start())
        if owner is None or depth_at[m.start()] != body_depth(owner):
            continue  # only members declared directly in a type body
        close = _find_paren_close(cleaned, m.end() - 1)
        if close is None:
            continue
        after = _next_nonspace(cleaned, close + 1)
        # allow `throws A, B` / generic `where` clauses between ) and { ;
        body_open = None
        body_close = None
        if after is not None:
            j = close + 1
            while j < len(cleaned) and cleaned[j] not in "{;}":
                j += 1
            if j < len(cleaned) and cleaned[j] == "{":
                body_open = j
                body_close = braces.get(j)
            elif j < len(cleaned) and cleaned[j] == ";":
                # C# expression-bodied member: `int Get() => Compute();` —
                # the arrow expression up to the semicolon IS the body, so
                # its invocations must be scanned like a braced body's
                arrow = cleaned.find("=>", close + 1, j)
                if arrow >= 0:
                    body_open, body_close = arrow + 1, j
            else:
                continue
        if dotted and body_open is None:
            # an explicit interface implementation always has a body ({
            # or =>); a bodiless dotted match is a field initializer
            # (`int x = Foo.Bar();`), not a declaration
            continue
        methods.append((name, m.start(1), m.end() - 1, body_open, body_close,
                        ret, cleaned[m.end():close], owner, "method"))
        seen_offsets.add(m.start(2))

    for m in _CTOR_RE.finditer(cleaned):
        name = m.group(1)
        if m.start(1) in seen_offsets or name in keywords:
            continue
        owner = enclosing_type(m.start(1))
        if owner is None or name != owner[1]:
            continue
        if depth_at[m.start(1)] != body_depth(owner):
            continue
        close = _find_paren_close(cleaned, m.end() - 1)
        if close is None:
            continue
        j = close + 1
        while j < len(cleaned) and cleaned[j] not in "{;}":
            j += 1
        if j < len(cleaned) and cleaned[j] == "{":
            body_open, body_close = j, braces.get(j)
        elif is_cs and j < len(cleaned) and cleaned[j] == ";":
            # C# expression-bodied constructor: `public C(int v) => _v =
            # Init(v);` — constructor_declaration with an
            # arrow_expression_clause body, captured like any other
            # constructor (csharp/analyzer.py get_entity_types)
            arrow = cleaned.find("=>", close + 1, j)
            if arrow < 0:
                continue
            body_open, body_close = arrow + 1, j
        else:
            continue
        methods.append((name, m.start(1), m.end() - 1, body_open, body_close,
                        None, cleaned[m.end():close], owner, "ctor"))

    # Java compact canonical constructors: inside a record body, `Name {`
    # with no parameter list at all (tree-sitter's
    # compact_constructor_declaration) — a constructor entity whose
    # parameters are implicitly the record components, so no params rows.
    if not is_cs:
        for m in re.finditer(r"(?<![\w.$>\]~])([A-Za-z_]\w*)\s*\{", cleaned):
            name = m.group(1)
            if m.start(1) in seen_offsets or name in keywords:
                continue
            owner = enclosing_type(m.start(1))
            if owner is None or owner[0] != "record" or name != owner[1]:
                continue
            if depth_at[m.start(1)] != body_depth(owner):
                continue
            body_open = m.end() - 1
            methods.append((name, m.start(1), body_open, body_open,
                            braces.get(body_open), None, "", owner, "ctor"))
            seen_offsets.add(m.start(1))

    # ---- members of anonymous-class / enum-constant bodies ----------------
    # tree-sitter captures entity nodes at ANY depth (reference
    # source_analyzer.py:44-58 recurses through every descendant), so a
    # method inside `new X(...) { ... }` or inside an enum constant's body
    # is an entity too, DEFINES-parented at the nearest enclosing entity.
    # The depth-filtered pass above admits only direct type-body members;
    # this pass admits direct members of class-LIKE brace scopes.
    method_bodies = {mm[3] for mm in methods if mm[3] is not None}
    class_like: list[tuple[int, int]] = []
    for am in re.finditer(
        r"\bnew\s+[A-Za-z_][\w.]*(?:\s*<(?:[^<>]|<[^<>]*>)*>)?\s*\(", cleaned
    ):
        aclose = _find_paren_close(cleaned, am.end() - 1)
        if aclose is None:
            continue
        nb = _next_nonspace(cleaned, aclose + 1)
        if nb is not None and cleaned[nb] == "{" and nb in braces:
            class_like.append((nb, braces[nb]))
    for kind, _tname, _tdecl, topen, tclose in types:
        if kind != "enum":
            continue
        bd = depth_at[topen] + 1
        for i in range(topen + 1, tclose):
            if (
                cleaned[i] != "{" or depth_at[i] != bd
                or i not in braces or i in method_bodies
                or i in anno_iface_bodies
            ):
                continue
            k = i - 1
            while k > topen and cleaned[k].isspace():
                k -= 1
            # a constant body follows the constant name or its arg list;
            # `static {` / instance initializers don't
            prev_tok = re.search(r"(\w+)\s*$", cleaned[max(topen, k - 30):k + 1])
            if (cleaned[k].isalnum() or cleaned[k] in "_)") and not (
                prev_tok and prev_tok.group(1) == "static"
            ):
                class_like.append((i, braces[i]))

    def innermost_class_like(off: int):
        best = None
        for o, c in class_like:
            if o < off <= c and depth_at[off] == depth_at[o] + 1:
                if best is None or o > best[0]:
                    best = (o, c)
        return best

    if class_like:
        outer_methods = list(methods)
        for m in _METHOD_RE.finditer(cleaned):
            if m.start(2) in seen_offsets:
                continue
            ret, name = m.group(1), m.group(3)
            dotted = "." in m.group(2)
            ret_base = ret.split("<")[0].split(".")[-1].strip()
            if (ret_base in keywords or name in keywords
                    or ret_base in _MODIFIERS
                    or ret_base in ("record", "struct", "class")
                    or ret_base == "operator"):
                continue
            if dotted and not is_cs:
                continue
            if is_cs and _is_delegate_decl(m.start(1)):
                continue
            if innermost_class_like(m.start()) is None:
                continue
            close = _find_paren_close(cleaned, m.end() - 1)
            if close is None:
                continue
            j = close + 1
            while j < len(cleaned) and cleaned[j] not in "{;}":
                j += 1
            if j < len(cleaned) and cleaned[j] == "{":
                body_open, body_close = j, braces.get(j)
            elif j < len(cleaned) and cleaned[j] == ";":
                arrow = cleaned.find("=>", close + 1, j)
                if arrow < 0:
                    continue
                body_open, body_close = arrow + 1, j
            else:
                continue
            # nearest enclosing entity: the innermost NAMED method whose
            # body contains the declaration (the reference's recursive
            # hierarchy parents anon-body members at the method that
            # created them), else the enclosing type
            parent = None
            for (mn, mdecl, _h, mbo, mbc, *_r) in outer_methods:
                if mbo is not None and mbc is not None and mbo < m.start() <= mbc:
                    if parent is None or mbo > parent[2]:
                        parent = (mn, mdecl, mbo)
            if parent is not None:
                pseudo_owner = (None, parent[0], parent[1], None, None)
            else:
                t = enclosing_type(m.start())
                if t is None:
                    continue
                pseudo_owner = (None, t[1], t[2], None, None)
            methods.append((name, m.start(1), m.end() - 1, body_open,
                            body_close, ret, cleaned[m.end():close],
                            pseudo_owner, "method"))
            seen_offsets.add(m.start(2))

    # ---- emit type entities (methods now known: a type declared inside
    # a method body parents at that METHOD, tree-sitter hierarchy) -------
    for kind, name, decl_off, start, end, doc, parent in pending_types:
        pname, pstart = (None, None)
        p_open = -1
        if parent is not None:
            pname, pstart = parent[1], _line_of(source, parent[2])
            p_open = parent[3]
        for (mn, mdecl, _h, mbo, mbc, *_r) in methods:
            if (
                mbo is not None and mbc is not None
                and mbo < decl_off <= mbc and mbo > p_open
            ):
                pname, pstart, p_open = mn, _line_of(source, mdecl), mbo
        rows.append(("entity", label_of[kind], name, path, start, end, doc,
                     pname, pstart, None, None, None))

    for (name, decl_off, _hdr_end, body_open, body_close, ret, params_txt,
         owner, mkind) in methods:
        start = _line_of(source, decl_off)
        end = _line_of(source, body_close if body_close is not None else decl_off)
        label = "Constructor" if mkind == "ctor" else "Method"
        doc = _doc_before(source, comments, decl_off, line_doc=is_cs, cleaned=cleaned)
        pname, pstart = owner[1], _line_of(source, owner[2])
        rows.append(("entity", label, name, path, start, end, doc,
                     pname, pstart, None, None, None))

        # parameters / return type (reference java/analyzer.py:96-101)
        for p in _split_params(params_txt):
            pn = _base_type_name(p)
            if pn:
                rows.append(("params", None, name, path, start, end, None,
                             None, None, pn, None, None))
        if mkind == "method" and ret:
            rn = _base_type_name(ret)
            if rn:
                rows.append(("returns", None, name, path, start, end, None,
                             None, None, rn, None, None))

        # invocations inside the body (reference java/analyzer.py:91-95)
        if body_open is not None and body_close is not None:
            body = cleaned[body_open + 1 : body_close]
            if not is_cs:
                # a Java annotation with an argument list inside a body
                # (`@SuppressWarnings("x") var y`, annotated lambda
                # params, local-class annotations) is an annotation
                # node in tree-sitter, never a method_invocation —
                # blank the whole span (offset-preserving) so its name
                # can't read as a callee
                body = _blank_spans(body, _ANNOT_ARGS_RE)
            sites: dict[int, str] = {}
            # parenthesized spans of non-invocation heads (declaration
            # headers, record patterns): nested matches inside them are
            # sub-patterns, not calls
            dead_end = -1
            for cm in _CALL_RE.finditer(body):
                callee = cm.group(1)
                if callee in keywords:
                    continue
                if cm.start() <= dead_end:
                    continue  # inside a record pattern's argument span
                pre = body[: cm.start()].rstrip()
                if pre.endswith("new"):  # object creation, not invocation
                    continue
                if pre.endswith("record"):
                    # a LOCAL record's positional header (`record Pair(int
                    # a, int b)`) is a declaration, not an invocation
                    continue
                if pre.endswith("instanceof") or (
                    is_cs and re.search(r"\bis$", pre) is not None
                ):
                    # Java 21 record pattern in instanceof (`s instanceof
                    # Point(int x, int y)`) / C# positional pattern in an
                    # `is` expression (`c.Center is Point(0, 0)`): pattern
                    # nodes; their argument spans hold sub-patterns, not
                    # calls
                    pclose = _find_paren_close(body, cm.end() - 1)
                    if pclose is not None:
                        dead_end = max(dead_end, pclose)
                    continue
                # a `when` guard between the last clause boundary and this
                # match means we are inside a guard EXPRESSION (Java 21
                # `case Point p when check(p) ->` / C# `Circle c when
                # Valid(c) =>`): tree-sitter parses these as genuine
                # method_invocation / invocation_expression nodes and the
                # reference captures them (java/analyzer.py:87,
                # csharp/analyzer.py:95) — exempt them from the
                # declaration-header rule below (ADVICE r8). A guard
                # `when` is PRECEDED by a pattern token (identifier, `_`,
                # or a closing paren/bracket of a positional pattern) —
                # requiring that excludes `when` used as a plain callee
                # (Mockito `when(mock.call())`) or receiver, which sat at
                # expression position and used to poison the whole
                # segment (ADVICE r9). C# switch-expression arms carry no
                # `case`, so the pattern-token test is the discriminator
                # that keeps both languages' guard pins green.
                in_guard = re.search(
                    r"[)\w\]]\s+when(?:\s|$)", re.split(r"[;{},]", pre)[-1]
                ) is not None
                # a matched "name(" whose argument list is followed by a
                # block or an arrow is a DECLARATION header, not an
                # invocation: C# local functions (`int Local(int k) {` /
                # `static int F(int k) => ...;`, local_function_statement
                # in tree-sitter, absent from the reference's entity-type
                # list) and Java local-class member headers. Genuine
                # invocation statements are followed by an operator, `;`,
                # `)` or `,` — never directly by `{` or `=>`.
                pclose = _find_paren_close(body, cm.end() - 1)
                if pclose is not None and not in_guard:
                    nxt = _next_nonspace(body, pclose + 1)
                    # a paren span directly followed by the `when` keyword
                    # is a GUARDED pattern header (`case Box(Point(int a,
                    # int b), int w) when valid(w) ->`): record/positional
                    # pattern, sub-patterns inside, never a call — no
                    # valid Java/C# invocation is followed by a bare
                    # identifier
                    if (
                        nxt is not None
                        and body[nxt: nxt + 4] == "when"
                        and not re.match(r"\w", body[nxt + 4: nxt + 5] or " ")
                    ):
                        dead_end = max(dead_end, pclose)
                        continue
                    if nxt is not None and (
                        body[nxt] == "{" or body[nxt: nxt + 2] == "=>"
                    ):
                        # the argument span holds parameters or nested
                        # sub-patterns (C# `Box(Point(var a, var b), _)
                        # =>` positional patterns), never invocations
                        dead_end = max(dead_end, pclose)
                        continue
                    # Java 21 record deconstruction pattern in a switch
                    # arm: `case Point(int x, int y) -> ...` is a
                    # record_pattern, not an invocation, and every match
                    # nested in its argument span (`case Box(Point(int a,
                    # int b), int w)`) is a sub-pattern. No valid Java
                    # CALL is ever directly followed by `->` (lambda
                    # parameter lists are plain identifiers); C# keeps
                    # `->` (unsafe pointer member access CAN follow a
                    # genuine call: `GetPtr(x)->field`).
                    if not is_cs and nxt is not None and body[nxt: nxt + 2] == "->":
                        dead_end = max(dead_end, pclose)
                        continue
                sites[cm.start(1)] = callee
            for cm in _CHAIN_CALL_RE.finditer(body):
                callee = cm.group(1)
                if callee not in keywords:
                    sites.setdefault(cm.start(1), callee)
            for cs_off in sorted(sites):
                callee = sites[cs_off]
                off = body_open + 1 + cs_off
                line = _line_of(source, off)
                text = (src_lines[line].strip()
                        if 0 <= line < len(src_lines) else None)
                rows.append(("call", None, name, path, start, end, None,
                             None, None, callee, line, text))
    return rows


def _find_paren_close(cleaned: str, open_off: int) -> int | None:
    depth = 0
    for i in range(open_off, len(cleaned)):
        if cleaned[i] == "(":
            depth += 1
        elif cleaned[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return None


def _next_nonspace(cleaned: str, off: int) -> int | None:
    for i in range(off, len(cleaned)):
        if not cleaned[i].isspace():
            return i
    return None


def parse_java_source(path: str, source: str) -> list[tuple]:
    """Java file → PARSE_SCHEMA rows (reference java/analyzer.py:41-107)."""
    return _parse_cfamily(path, source, "java")


def parse_csharp_source(path: str, source: str) -> list[tuple]:
    """C# file → PARSE_SCHEMA rows (reference csharp/analyzer.py:33-110)."""
    return _parse_cfamily(path, source, "cs")


# -- C (reference api/analyzers/c/analyzer.py — present but DISABLED in the
#    reference's registry, source_analyzer.py:25 `# '.c': CAnalyzer()`; we
#    enable the language for real: struct + function entities, calls,
#    params/returns, matching tests/test_c_analyzer.py's expectations in
#    row-shape terms) ---------------------------------------------------------

_C_KEYWORDS = {
    "if", "for", "while", "switch", "return", "sizeof", "do", "else",
    "case", "break", "continue", "goto", "typedef", "static", "extern",
    "inline", "register", "volatile", "const", "struct", "union", "enum",
}
_C_TYPE_QUALS = ("const", "struct", "union", "enum", "unsigned", "signed",
                 "volatile", "register", "restrict", "static", "inline")

_C_STRUCT_RE = re.compile(r"\bstruct\s+([A-Za-z_]\w*)\s*\{")
# C function-definition head: one or more type words each followed by
# whitespace and/or `*`s, then the function name, then `(`. Unlike the
# shared _METHOD_RE (Java/C# — no pointer types), this admits pointer
# returns: `void *fn(`, `char **fn(`, `struct Node *fn(`, `void*fn(`.
# Found by the ground-truth generator campaign (tools/gen_truth_fuzz.py,
# r10): every pointer-returning definition was silently skipped because
# `\s+` in _METHOD_RE cannot cross the `*`s. A `type (*name(args))(args)`
# function-pointer-returning declarator stays uncaptured (the name is
# preceded by `(*`, not type words) — the documented agreed absence.
_C_FN_RE = re.compile(
    r"((?:[A-Za-z_]\w*[\s*]+)+?)([A-Za-z_]\w*)\s*\("
)
# a preprocessor directive line, following backslash continuations —
# tree-sitter-c parses `#define MAX(a,b) ...` as preproc_function_def,
# never function_definition, so directive text must not reach the
# method/struct scan (a function-like macro would otherwise read as a
# Function entity and swallow the next brace block as its body). Macro
# USES inside function bodies stay: tree-sitter parses those as
# ordinary call_expression nodes.
_C_PREPROC_RE = re.compile(r"^[ \t]*#(?:\\\r?\n|[^\n])*", re.M)


def _c_base_type(tok: str) -> str | None:
    """`const char **argv` → char; `struct exp *e` → exp."""
    tok = tok.replace("*", " ").replace("[", " ").replace("]", " ")
    parts = [p for p in tok.split() if p and p not in _C_TYPE_QUALS]
    if len(parts) < 1:
        return None
    # last part is the arg name (when present); the type is what precedes
    name = parts[0] if len(parts) == 1 else parts[-2] if len(parts) >= 2 else None
    return name if name and re.fullmatch(r"[A-Za-z_]\w*", name) else None


def parse_c_source(path: str, source: str) -> list[tuple]:
    """C file → PARSE_SCHEMA rows: top-level function definitions (with
    body — prototypes are declarations, not entities), struct types,
    invocations, parameter/return types. Struct FIELD inventory is the one
    reference detail our row schema doesn't model (documented divergence).
    """
    cleaned, comments = _strip(source)
    cleaned = _blank_spans(cleaned, _C_PREPROC_RE)
    braces = _brace_match(cleaned)
    rows: list[tuple] = []
    src_lines = source.splitlines()

    depth = 0
    depth_at = [0] * (len(cleaned) + 1)
    for i, ch in enumerate(cleaned):
        depth_at[i] = depth
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth = max(0, depth - 1)
    depth_at[len(cleaned)] = depth

    for m in _C_STRUCT_RE.finditer(cleaned):
        if depth_at[m.start()] != 0:
            continue
        open_off = cleaned.index("{", m.start())
        close = braces.get(open_off)
        if close is None:
            continue
        rows.append((
            "entity", "Struct", m.group(1), path, _line_of(source, m.start()),
            _line_of(source, close), _doc_before(source, comments, m.start(),
                                                 line_doc=False, cleaned=cleaned),
            None, None, None, None, None,
        ))

    for m in _C_FN_RE.finditer(cleaned):
        ret, name = m.group(1).strip(), m.group(2)
        ret_words = ret.replace("*", " ").split()
        ret_base = ret_words[-1] if ret_words else ""
        if name in _C_KEYWORDS or ret_base in ("return", "sizeof", "else",
                                               "typedef", "goto", "case"):
            continue
        if depth_at[m.start()] != 0:
            continue  # only top-level definitions are entities
        close = _find_paren_close(cleaned, m.end() - 1)
        if close is None:
            continue
        j = close + 1
        while j < len(cleaned) and cleaned[j] not in "{;}":
            j += 1
        if j >= len(cleaned) or cleaned[j] != "{":
            continue  # prototype / macro use — not a definition
        body_open, body_close = j, braces.get(j)
        start = _line_of(source, m.start(1))
        end = _line_of(source, body_close if body_close is not None else j)
        rows.append((
            "entity", "Function", name, path, start, end,
            _doc_before(source, comments, m.start(1), line_doc=False,
                        cleaned=cleaned),
            None, None, None, None, None,
        ))
        for p in _split_params(cleaned[m.end():close]):
            pn = _c_base_type(p)
            if pn and pn != "void":
                rows.append(("params", None, name, path, start, end, None,
                             None, None, pn, None, None))
        rn = _c_base_type(ret + " _")  # treat ret as "type name" pair
        if rn and rn != "void":
            rows.append(("returns", None, name, path, start, end, None,
                         None, None, rn, None, None))
        if body_close is not None:
            body = cleaned[body_open + 1: body_close]
            for cm in _CALL_RE.finditer(body):
                callee = cm.group(1)
                if callee in _C_KEYWORDS:
                    continue
                off = body_open + 1 + cm.start(1)
                line = _line_of(source, off)
                text = (src_lines[line].strip()
                        if 0 <= line < len(src_lines) else None)
                rows.append(("call", None, name, path, start, end, None,
                             None, None, callee, line, text))
    return rows
