"""Registry batch 4 (round 2): Java/C# analyzer coverage and other
round-2 operators, as (query, oracle) pairs.

The analyzer query runs the REAL distributed pipeline (binary rows →
mapInPandas parse → name-resolution joins) over an embedded two-language
fixture; its oracle is the golden constant inventory (a VALUES table —
DuckDB needs no input tables), which is the same shape of assertion the
reference's own analyzer tests make (tests/test_csharp_analyzer.py:30-69).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register

CSHARP_FIXTURE = """\
using System;

namespace TestProject
{
    public interface ILogger
    {
        void Log(string message);
    }

    public class ConsoleLogger : ILogger
    {
        public void Log(string message)
        {
            Console.WriteLine(message);
        }
    }

    /// <summary>
    /// Represents a task to be executed.
    /// </summary>
    public class Task
    {
        public string Name { get; set; }
        private ILogger _logger;

        public Task(string name, ILogger logger)
        {
            Name = name;
            _logger = logger;
            _logger.Log("Task created: " + name);
        }

        public bool Execute()
        {
            _logger.Log("Executing: " + Name);
            return true;
        }

        public void Abort(float delay)
        {
            _logger.Log("Aborting: " + Name);
            Execute();
        }
    }
}
"""

JAVA_FIXTURE = """\
/** Greets people. */
public class Greeter extends Base implements Hello, Goodbye {
    private String name;

    /** ctor doc */
    public Greeter(String name) {
        this.name = name;
        register(name);
    }

    public String greet(int times) {
        register(name);
        return name;
    }
}

interface Hello extends Salutation {
    void sayHello(String who);
}

interface Goodbye {
    void sayGoodbye(String who);
}

class Base {
    public void register(String name) {
    }
}

enum Color { RED, GREEN }
"""

_S2_GOLDEN = [
    # (label, name, path, src_start, defines, calls, extends, implements, returns, parameters)
    ("Class", "Greeter", "Greeter.java", 1, 2, 0, 1, 2, 0, 0),
    ("Constructor", "Greeter", "Greeter.java", 5, 0, 1, 0, 0, 0, 0),
    ("Method", "greet", "Greeter.java", 10, 0, 1, 0, 0, 0, 0),
    ("Interface", "Hello", "Greeter.java", 16, 1, 0, 0, 0, 0, 0),
    ("Method", "sayHello", "Greeter.java", 17, 0, 0, 0, 0, 0, 0),
    ("Interface", "Goodbye", "Greeter.java", 20, 1, 0, 0, 0, 0, 0),
    ("Method", "sayGoodbye", "Greeter.java", 21, 0, 0, 0, 0, 0, 0),
    ("Class", "Base", "Greeter.java", 24, 1, 0, 0, 0, 0, 0),
    ("Method", "register", "Greeter.java", 25, 0, 0, 0, 0, 0, 0),
    ("Enum", "Color", "Greeter.java", 29, 0, 0, 0, 0, 0, 0),
    ("Interface", "ILogger", "Program.cs", 4, 1, 0, 0, 0, 0, 0),
    ("Method", "Log", "Program.cs", 6, 0, 0, 0, 0, 0, 0),
    ("Class", "ConsoleLogger", "Program.cs", 9, 1, 0, 0, 1, 0, 0),
    ("Method", "Log", "Program.cs", 11, 0, 0, 0, 0, 0, 0),
    ("Class", "Task", "Program.cs", 20, 3, 0, 0, 0, 0, 0),
    ("Constructor", "Task", "Program.cs", 25, 0, 1, 0, 0, 0, 1),
    ("Method", "Execute", "Program.cs", 32, 0, 1, 0, 0, 0, 0),
    ("Method", "Abort", "Program.cs", 38, 0, 2, 0, 0, 0, 0),
]

_S2_ORACLE = "SELECT * FROM (VALUES " + ", ".join(
    f"('{l}', '{n}', '{p}', {s}, {d}, {c}, {e}, {i}, {r}, {pa})"
    for (l, n, p, s, d, c, e, i, r, pa) in _S2_GOLDEN
) + (
    ") t(label, name, path, src_start, defines_out, calls_out, "
    "extends_out, implements_out, returns_out, parameters_out)"
)


@register("s2_cfamily_analyzer", _S2_ORACLE)
def s2_cfamily_analyzer(spark, sf_dir):
    """S2 (Java/C# parse) + J13 (typed symbol resolution): full pipeline
    over the embedded fixture, summarized as per-entity out-edge counts
    (reference java/analyzer.py:41-107, csharp/analyzer.py:33-110)."""
    from .sources.python_analyzer import graph_from_parsed, parse_files

    files = spark.createDataFrame(
        [("Program.cs", CSHARP_FIXTURE.encode()),
         ("Greeter.java", JAVA_FIXTURE.encode())],
        "path string, content binary",
    )
    nodes, edges = graph_from_parsed(spark, parse_files(files))
    ent = nodes.filter(F.element_at("labels", 1) != "File")
    out = ent.select(
        F.element_at("labels", 1).alias("label"),
        "name", "path",
        F.col("src_start").cast("int").alias("src_start"),
        F.col("id").alias("_id"),
    )
    for t in ["DEFINES", "CALLS", "EXTENDS", "IMPLEMENTS", "RETURNS", "PARAMETERS"]:
        cnt = (
            edges.filter(F.col("type") == t)
            .groupBy("src")
            .agg(F.count("*").alias(f"{t.lower()}_out"))
        )
        out = out.join(cnt, out["_id"] == cnt["src"], "left_outer").drop("src")
    return out.select(
        "label", "name", "path", "src_start",
        *[
            F.coalesce(F.col(f"{t.lower()}_out"), F.lit(0)).cast("int").alias(f"{t.lower()}_out")
            for t in ["DEFINES", "CALLS", "EXTENDS", "IMPLEMENTS", "RETURNS", "PARAMETERS"]
        ],
    )
