"""Grammar-directed differential fuzz for the C-family scanner.

tools/fuzz_cfamily.py checks weak invariants (never raises, row shape,
linearity) on token soup. This generator builds WELL-FORMED random Java
compilation units while tracking the ground-truth entity set — every
(label, name, parent) triple the scanner must emit and nothing else —
then asserts set equality. Decoy declarations are woven into line/block
comments, string literals and text blocks, so a tokenizer that loses
string/comment state shows up as a phantom entity immediately.

Scanner semantics pinned by tests/test_cfamily_analyzer.py and verified
empirically before this generator was written:
- class/record -> Class, interface -> Interface, enum -> Enum;
- methods (including abstract/native/interface signatures) -> Method,
  parent = the immediately enclosing type's simple name;
- constructors (including record compact constructors) -> Constructor;
- fields, static/instance initializer blocks, enum constants, lambdas
  -> NO entity;
- a LOCAL class declared in a method body parents to the METHOD name,
  as do the members of an anonymous `new Iface() { ... }` body;
- methods in an enum CONSTANT body parent to the enum itself;
- sealed/permits headers and multi-line parameter lists parse as usual.

r11 tranche (each family found-or-verified against the scanner, two
defects promoted to pinned fixtures in tests/test_cfamily_analyzer.py):
- Java sealed types now carry PERMITS lists (inline and wrapped
  multi-line), plus the non-sealed modifier;
- annotation-heavy declarations: stacked annotations, brace-array
  arguments (`@Anno2({ 1, 2, 3 })`), multi-line annotations with NESTED
  annotations inside brace arrays (@Table/@Index), parameter
  annotations; nested `@interface` declarations as no-entity decoys —
  found the enum-body leak (annotation elements with brace defaults
  read as enum methods);
- C# generic headers with `where` constraint clauses on types and
  methods (inline, stacked multi-line, brace-on-own-line) — found the
  `where T : class`-at-line-end phantom type; nested generic
  return/parameter types; attribute lists with brace-bearing arguments.

Usage: python tools/gen_truth_fuzz.py [n_units (default 2000)] [seed]
Mismatches print the generated source plus the expected/got diff —
promote each into a pinned test.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TYPES = ["int", "long", "String", "double", "Object", "boolean"]
ANNOS = [
    "@Override",
    "@Deprecated",
    '@SuppressWarnings("all")',
    '@SuppressWarnings({"a", "b"})',
    "@Anno2({ 1, 2, 3 })",
    '@Bean(init = { "a{b}c" })',
]
# multi-line annotation with nested annotations inside a brace array —
# the brace-heaviest shape javac accepts (r11 tranche)
ML_ANNO = (
    '{i}@Table(\n{i}    name = "t{{x}}",\n'
    '{i}    indexes = {{ @Index(columnList = "a"), @Index(columnList = "b") }}\n'
    "{i})"
)
DECOYS = [
    "class Fake {{ void nope() {{}} }}",
    "interface IFake {{ int bad(); }}",
    "enum EFake {{ A, B }}",
    "void phantom(int x) {{ }}",
    "record RFake(int a) {{}}",
]


class _Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng
        self.n = 0
        self.expected: set[tuple[str, str, str | None]] = set()
        self.lines: list[str] = []

    def fresh(self, prefix: str) -> str:
        self.n += 1
        return f"{prefix}{self.n}"

    def decoy_line(self, indent: str) -> str:
        r = self.rng
        d = r.choice(DECOYS).format()
        style = r.randrange(4)
        if style == 0:
            return f"{indent}// {d}"
        if style == 1:
            return f"{indent}/* {d} */"
        if style == 2:
            v = self.fresh("s")
            return f'{indent}String {v} = "{d}";'
        v = self.fresh("tb")
        return f'{indent}String {v} = """\n{indent}    {d}\n{indent}    """;'

    def anno_block(self, indent: str) -> str:
        """0-2 stacked annotations (possibly multi-line with brace-array
        arguments), rendered as a prefix ending at `indent` so the decl
        head concatenates directly after it."""
        r = self.rng
        out = []
        for _ in range(r.randrange(3)):
            if r.random() < 0.2:
                out.append(ML_ANNO.format(i=indent).lstrip())
            else:
                out.append(r.choice(ANNOS))
        return "".join(a + "\n" + indent for a in out)

    def method(self, indent: str, owner: str, iface: bool) -> None:
        r = self.rng
        name = self.fresh("m")
        self.expected.add(("Method", name, owner))
        anno = self.anno_block(indent)
        gen = "<T extends Number> " if r.random() < 0.2 else ""
        ret = r.choice(TYPES + ["void", "T" if gen else "void"])
        nargs = r.randrange(3)
        def _param(i: int) -> str:
            panno = (
                r.choice(["@Deprecated ", '@SuppressWarnings("p") '])
                if r.random() < 0.15
                else ""
            )
            var = "..." if r.random() < 0.1 and i == nargs - 1 else ""
            return f"{panno}{r.choice(TYPES)}{var} p{i}"

        params = ", ".join(_param(i) for i in range(nargs))
        throws = " throws Exception" if r.random() < 0.2 else ""
        if r.random() < 0.15 and nargs >= 2:
            # multi-line parameter list
            params = f"\n{indent}    " + f",\n{indent}    ".join(
                f"{r.choice(TYPES)} p{i}" for i in range(nargs)
            ) + f"\n{indent}"
        head = f"{indent}{anno}{'default ' if iface and r.random() < 0.4 else ''}{gen}{ret} {name}({params}){throws}"
        if iface and r.random() < 0.5 and "default" not in head:
            self.lines.append(head + ";")
            return
        body = []
        if r.random() < 0.5:
            body.append(f"{indent}    helper{r.randrange(9)}(1, 2);")
        if r.random() < 0.3:
            body.append(f'{indent}    String q = "void inString() {{}}";')
        if r.random() < 0.3:
            body.append(f"{indent}    Runnable rr = () -> other{r.randrange(9)}();")
        if r.random() < 0.3:
            body.append(
                f"{indent}    if (p0 > 0) {{ switch (p0) {{ case 1 -> go(); default -> {{}} }} }}"
                if nargs
                else f"{indent}    do {{ }} while (false);"
            )
        if r.random() < 0.2:
            # local class: parents to the METHOD name
            lc = self.fresh("L")
            lm = self.fresh("m")
            self.expected.add(("Class", lc, name))
            self.expected.add(("Method", lm, lc))
            body.append(f"{indent}    class {lc} {{ void {lm}() {{ ping(); }} }}")
        if r.random() < 0.2:
            # anonymous class body: members parent to the METHOD name
            am = self.fresh("m")
            self.expected.add(("Method", am, name))
            body.append(
                f"{indent}    Runnable an = new Runnable() {{\n"
                f"{indent}        public void {am}() {{ go(); }}\n"
                f"{indent}    }};"
            )
        ret_stmt = (
            f"{indent}    return {'null' if ret in ('String', 'Object', 'T') else ('true' if ret == 'boolean' else '0')};"
            if ret != "void"
            else ""
        )
        self.lines.append(head + " {")
        self.lines.extend(body)
        if ret_stmt:
            self.lines.append(ret_stmt)
        self.lines.append(f"{indent}}}")

    def typedecl(self, indent: str, parent: str | None, depth: int) -> str:
        r = self.rng
        kind = r.choice(["class", "class", "interface", "enum", "record"])
        name = self.fresh("T")
        label = {"class": "Class", "record": "Class",
                 "interface": "Interface", "enum": "Enum"}[kind]
        self.expected.add((label, name, parent))
        anno = indent + self.anno_block(indent) if r.random() < 0.35 else indent
        sealed = False
        mods = r.choice(["", "public ", "final ", "static " if parent else "public "])
        if kind in ("class", "interface"):
            roll = r.random()
            if roll < 0.15:
                mods += "sealed "
                sealed = True
            elif roll < 0.22:
                mods += "non-sealed "
        head = f"{anno}{mods}{kind} {name}"
        if kind in ("class", "interface") and r.random() < 0.2:
            head += "<T1, T2 extends Comparable<? super T1>>"
        if kind == "record":
            head += f"({r.choice(TYPES)} a, {r.choice(TYPES)} b)"
        if kind == "class" and r.random() < 0.3:
            head += " extends Base"
        if kind in ("class", "enum", "record") and r.random() < 0.3:
            head += " implements Cmp"
        elif kind == "interface" and r.random() < 0.3:
            head += " extends Sup"
        if sealed:
            # permits is the LAST header clause (JLS 8.1.6); exercise the
            # single-line and the wrapped multi-line form
            perms = [f"P{name}x{i}" for i in range(r.randrange(1, 4))]
            if r.random() < 0.3 and len(perms) > 1:
                sep = f",\n{indent}        "
                head += f" permits\n{indent}        " + sep.join(perms)
            else:
                head += " permits " + ", ".join(perms)
        self.lines.append(head + " {")
        inner = indent + "    "
        if kind == "enum":
            consts = []
            for i in range(r.randrange(1, 4)):
                c = f"C{i}"
                if r.random() < 0.3:
                    c += f"({i})"
                if r.random() < 0.2:
                    # constant body: its methods parent to the ENUM name
                    hm = self.fresh("m")
                    self.expected.add(("Method", hm, name))
                    c += f" {{ void {hm}() {{ tick(); }} }}"
                consts.append(c)
            self.lines.append(f"{inner}{', '.join(consts)};")
        if kind == "record" and r.random() < 0.4:
            # compact canonical constructor
            self.expected.add(("Constructor", name, name))
            self.lines.append(f"{inner}{name} {{ check(a); }}")
        for _ in range(r.randrange(4)):
            pick = r.random()
            if pick < 0.45:
                self.method(inner, name, kind == "interface")
            elif pick < 0.6 and kind == "class":
                self.expected.add(("Constructor", name, name))
                self.lines.append(
                    f"{inner}{name}({r.choice(TYPES)} a) {{ this.f = a; setup(a); }}"
                )
            elif pick < 0.75:
                self.lines.append(self.decoy_line(inner))
            elif pick < 0.85 and kind != "interface":
                self.lines.append(f"{inner}private {r.choice(TYPES)} f{self.n} = 0;")
                self.n += 1
            elif pick < 0.9 and kind == "class":
                self.lines.append(
                    f"{inner}{'static ' if r.random() < 0.5 else ''}{{ init(); }}"
                )
            elif pick < 0.94 and kind != "interface":
                # nested annotation type: tree-sitter
                # annotation_type_declaration — NO entity, and its element
                # "methods" (`String value() default ...`) emit nothing
                mi = self.fresh("Meta")
                self.lines.append(
                    f"{inner}@interface {mi} {{ String value() default "
                    f'"x"; int[] nums() default {{ 1, 2 }}; }}'
                )
            elif depth < 2:
                self.typedecl(inner, name, depth + 1)
        self.lines.append(f"{indent}}}")
        return name


CS_TYPES = ["int", "long", "string", "double", "object", "bool"]
CS_GENERIC_TYPES = [
    "List<int>",
    "Dictionary<string, List<int>>",
    "IReadOnlyList<Dictionary<int, string>>",
    "Task<List<long>>",
]
CS_ATTRS = [
    "[Serializable]",
    '[Obsolete("braces { in } attr")]',
    '[Custom(Names = new[] { "a", "b" })]',
    "[MethodImpl(MethodImplOptions.AggressiveInlining)]",
]
CS_CONSTRAINTS = [
    "class",
    "struct",
    "notnull",
    "new()",
    "class, new()",
    "IComparable<{tp}>",
    "IList<List<{tp}>>",
    "IEquatable<{tp}>, new()",
]
CS_DECOYS = [
    "class Fake { void Nope() {} }",
    "interface IFake { int Bad(); }",
    "struct SFake { }",
    "void Phantom(int x) { }",
]


class _CsGen:
    """C# arm. Extra pinned semantics (verified empirically): properties
    (auto, expression-bodied), indexers, events, operators, delegates,
    fields and LOCAL FUNCTIONS emit NO entity; expression-bodied METHODS
    do; record positional parameters alone emit no Constructor (an
    explicit one does); interpolated/verbatim strings with brace decoys
    must not leak entities."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.n = 0
        self.expected: set[tuple[str, str, str | None]] = set()
        self.lines: list[str] = []

    def fresh(self, prefix: str) -> str:
        self.n += 1
        return f"{prefix}{self.n}"

    def decoy_line(self, indent: str) -> str:
        r = self.rng
        d = r.choice(CS_DECOYS)
        style = r.randrange(4)
        if style == 0:
            return f"{indent}// {d}"
        if style == 1:
            return f"{indent}/* {d} */"
        if style == 2:
            v = self.fresh("s")
            return f'{indent}string {v} = @"{d}";'
        v = self.fresh("s")
        return (
            f'{indent}string {v} = $"{d.replace("{", "{{").replace("}", "}}")}'
            f' {{this.n}}";'
        )

    def method(self, indent: str, owner: str, iface: bool) -> None:
        r = self.rng
        name = self.fresh("M")
        self.expected.add(("Method", name, owner))
        ret = r.choice(CS_TYPES + ["void"] + CS_GENERIC_TYPES)
        nargs = r.randrange(3)
        params = ", ".join(
            f"{r.choice(['', 'in ', 'ref ', 'out '])[:0 if i else None] or ''}"
            f"{r.choice(CS_TYPES + CS_GENERIC_TYPES)} p{i}"
            for i in range(nargs)
        )
        mods = "public " if not iface else ""
        if r.random() < 0.15:
            mods += "async "
            ret = "Task" if ret == "void" else f"Task<{ret}>"
        attrs = ""
        for _ in range(r.randrange(3) if r.random() < 0.3 else 0):
            attrs += r.choice(CS_ATTRS) + "\n" + indent
        gen = ""
        where = ""
        if not mods.startswith("public async") and r.random() < 0.2:
            # generic method with a constraint clause between ) and body
            gen = "<TM>"
            c = r.choice(CS_CONSTRAINTS).format(tp="TM")
            where = f" where TM : {c}"
        head = f"{indent}{attrs}{mods}{ret} {name}{gen}({params}){where}"
        if iface and r.random() < 0.5:
            self.lines.append(head + ";")
            return
        if r.random() < 0.3:
            val = "1" if ret not in ("void", "Task") else None
            if val and not ret.startswith("Task"):
                self.lines.append(head + f" => Compute({val});")
                return
        body = []
        if r.random() < 0.5:
            body.append(f"{indent}    Helper{r.randrange(9)}(1, 2);")
        if r.random() < 0.25:
            body.append(f"{indent}    int Local() => 1; var z = Local();")
        if r.random() < 0.25:
            body.append(f"{indent}    var l = (int a) => a + 1;")
        if r.random() < 0.25:
            body.append(self.decoy_line(indent + "    "))
        if "async" in mods:
            body.append(f"{indent}    await Go();")
        ret_stmt = (
            f"{indent}    return default;"
            if ret not in ("void", "Task")
            else ""
        )
        self.lines.append(head + " {")
        self.lines.extend(body)
        if ret_stmt:
            self.lines.append(ret_stmt)
        self.lines.append(f"{indent}}}")

    def typedecl(self, indent: str, parent: str | None, depth: int) -> str:
        r = self.rng
        kind = r.choice(["class", "class", "struct", "interface", "enum", "record"])
        name = self.fresh("T")
        label = {"class": "Class", "record": "Class", "struct": "Struct",
                 "interface": "Interface", "enum": "Enum"}[kind]
        self.expected.add((label, name, parent))
        attrs = ""
        for _ in range(r.randrange(3) if r.random() < 0.3 else 0):
            attrs += r.choice(CS_ATTRS) + "\n" + indent
        mods = r.choice(["public ", "internal ", ""])
        if kind == "class" and r.random() < 0.15:
            mods += r.choice(["sealed ", "abstract ", "partial "])
        head = f"{indent}{attrs}{mods}{kind} {name}"
        wheres: list[str] = []
        if kind != "enum" and r.random() < 0.35:
            tps = ["TA", "TB"][: r.randrange(1, 3)]
            head += f"<{', '.join(tps)}>"
            for tp in tps:
                if r.random() < 0.7:
                    c = r.choice(CS_CONSTRAINTS).format(tp=tp)
                    wheres.append(f"where {tp} : {c}")
        if kind == "record" and r.random() < 0.6:
            head += f"({r.choice(CS_TYPES)} A, {r.choice(CS_TYPES)} B)"
        if kind in ("class", "record") and r.random() < 0.3:
            head += " : Base, IFoo"
        elif kind == "interface" and r.random() < 0.3:
            head += " : ISup"
        if kind == "enum":
            self.lines.append(head + " { One, Two }")
            return name
        if wheres:
            # constraint clauses sit between the base list and the body;
            # exercise inline, stacked-multi-line, and brace-on-own-line
            # forms (the r11 tranche: `: class` / `: struct` at line end
            # followed by `where`/`{` is the phantom-type territory)
            style = r.randrange(3)
            if style == 0:
                head += " " + " ".join(wheres)
            else:
                head += "".join(f"\n{indent}    {w}" for w in wheres)
                if style == 2:
                    self.lines.append(head)
                    head = indent
        self.lines.append(head + ("{" if head == indent else " {"))
        inner = indent + "    "
        for _ in range(r.randrange(4)):
            pick = r.random()
            if pick < 0.4:
                self.method(inner, name, kind == "interface")
            elif pick < 0.55 and kind in ("class", "struct", "record"):
                self.expected.add(("Constructor", name, name))
                chain = (
                    " : this(0, 0)" if kind == "record" and "(" in head
                    else (" : base()" if r.random() < 0.3 and kind == "class" else "")
                )
                self.lines.append(
                    f"{inner}public {name}(int a, int b){chain} {{ Setup(a); }}"
                )
            elif pick < 0.7:
                # no-entity members: property / event / field / indexer
                m = r.randrange(4)
                if m == 0:
                    self.lines.append(
                        f"{inner}public int P{self.n} {{ get; set; }}"
                    )
                elif m == 1 and kind != "interface":
                    self.lines.append(f"{inner}public event Action On{self.n};")
                elif m == 2 and kind != "interface":
                    self.lines.append(f"{inner}private int f{self.n} = 0;")
                else:
                    self.lines.append(
                        f"{inner}public int this[int i] => i * {self.n + 1};"
                    )
                self.n += 1
            elif pick < 0.85:
                self.lines.append(self.decoy_line(inner))
            elif depth < 2 and kind != "interface":
                self.typedecl(inner, name, depth + 1)
        self.lines.append(f"{indent}}}")
        return name


C_TYPES = [
    "int", "long", "double", "char *", "void *", "size_t",
    "char **", "const char *", "struct Node *", "unsigned long",
]
C_DECOYS = [
    "int fake_fn(void) { return 0; }",
    "struct Fake { int x; };",
    "void phantom(int a) { }",
]


class _CGen:
    """C arm. Pinned semantics (verified empirically; the reference's C
    analyzer is disabled upstream, so this scanner's own documented
    behavior is the spec): function DEFINITIONS -> Function and
    top-level struct definitions -> Struct, both parentless; unions,
    enums, typedef aliases, macros (including multi-line function-like
    macros), forward declarations, globals, function-pointer typedefs,
    and struct definitions nested in structs or function bodies emit NO
    entity."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.n = 0
        self.expected: set[tuple[str, str, str | None]] = set()
        self.lines: list[str] = []

    def fresh(self, prefix: str) -> str:
        self.n += 1
        return f"{prefix}{self.n}"

    def decoy_line(self, indent: str) -> str:
        r = self.rng
        d = r.choice(C_DECOYS)
        style = r.randrange(3)
        if style == 0:
            return f"{indent}// {d}"
        if style == 1:
            return f"{indent}/* {d} */"
        v = self.fresh("s")
        return f'{indent}const char *{v} = "{d}";'

    def func(self) -> None:
        r = self.rng
        name = self.fresh("fn")
        self.expected.add(("Function", name, None))
        ret = r.choice(C_TYPES + ["void"])
        mods = r.choice(["", "static ", "static inline "])
        nargs = r.randrange(3)
        params = ", ".join(
            f"{r.choice(C_TYPES)} p{i}" for i in range(nargs)
        ) or "void"
        self.lines.append(f"{mods}{ret} {name}({params}) {{")
        if r.random() < 0.5:
            self.lines.append(f"    use{r.randrange(9)}(1, 2);")
        if r.random() < 0.25:
            self.lines.append("    struct LocalS { int l; } v; v.l = 1;")
        if r.random() < 0.25:
            self.lines.append(self.decoy_line("    "))
        if r.random() < 0.3:
            self.lines.append(f"    for (int i = 0; i < {self.n}; i++) {{ tick(i); }}")
        if ret != "void":
            self.lines.append("    return 0;")
        self.lines.append("}")

    def top(self) -> None:
        r = self.rng
        pick = r.random()
        if pick < 0.45:
            self.func()
        elif pick < 0.6:
            name = self.fresh("S")
            self.expected.add(("Struct", name, None))
            inner = " struct In { int i; } in;" if r.random() < 0.2 else ""
            td = r.random() < 0.5
            if td:
                self.lines.append(
                    f"typedef struct {name} {{ int a;{inner} }} {name};"
                )
            else:
                self.lines.append(f"struct {name} {{ int a;{inner} }};")
        elif pick < 0.7:
            # no-entity type shapes
            m = r.randrange(4)
            if m == 0:
                self.lines.append(f"typedef union U{self.n} {{ int i; float f; }} U{self.n};")
            elif m == 1:
                self.lines.append(f"enum E{self.n} {{ A{self.n}, B{self.n} }};")
            elif m == 2:
                self.lines.append(f"typedef int (*cb{self.n})(const void *, int);")
            else:
                self.lines.append(f"static int g{self.n} = 0;")
            self.n += 1
        elif pick < 0.85:
            m = r.randrange(3)
            if m == 0:
                self.lines.append(f"#define SQ{self.n}(x) ((x)*(x))")
            elif m == 1:
                self.lines.append(
                    f"#define LONG{self.n}(x) \\\n    do {{ use(x); }} while (0)"
                )
            else:
                self.lines.append(f"static int fwd{self.n}(int a);")
            self.n += 1
        else:
            self.lines.append(self.decoy_line(""))

    def typedecl(self, indent: str, parent, depth: int) -> None:  # API parity
        self.top()


def run(n_units: int, seed: int) -> int:
    from code_graph_backend_spark.sources.cfamily_analyzer import (
        parse_c_source,
        parse_csharp_source,
        parse_java_source,
    )

    rng = random.Random(seed)
    failures = 0
    for i in range(n_units):
        for gen_cls, parse, fname in (
            (_Gen, parse_java_source, "G.java"),
            (_CsGen, parse_csharp_source, "G.cs"),
            (_CGen, parse_c_source, "g.c"),
        ):
            g = gen_cls(random.Random(rng.randrange(1 << 30)))
            for _ in range(g.rng.randrange(1, 4)):
                g.typedecl("", None, 0)
            src = "\n".join(g.lines) + "\n"
            rows = parse(fname, src)
            got = {(r[1], r[2], r[7]) for r in rows if r[0] == "entity"}
            if got != g.expected:
                failures += 1
                print(f"=== MISMATCH unit {i} ({fname}) ===")
                print(src)
                print("missing:", sorted(g.expected - got))
                print("phantom:", sorted(got - g.expected))
                if failures >= 5:
                    return failures
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    bad = run(n, seed)
    print(f"ground-truth fuzz: {n} units, {bad} mismatches")
