package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Lint: no oracle may ship a column type the driver's hasher aliases
  * differently from the Spark result at equal values. DuckDB types an
  * uncasted integer `sum()` as HUGEINT, which hash-mismatches a Spark
  * BIGINT even when every cell is equal — this false-fail class bit in
  * rounds 1 AND 4 (q82/q89/q92). The spec DESCRIBEs every registered
  * oracle in DuckDB (via the driver-side python, which is where the gate
  * actually runs) and fails the build on any banned type.
  */
class OracleLintSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    scala.util.Try(
      Seq("python3", "-c", "import duckdb").! == 0
    ).getOrElse(false)

  test("every oracle DESCRIBEs clean in DuckDB: no HUGEINT / unsigned columns") {
    assume(haveDuckdb, "python3+duckdb not on this box; driver gate covers it")
    val dir = Files.createTempDirectory("oracle-lint")
    val json = dir.resolve("oracle_sql.json")
    Files.writeString(json, Verify.oracleJson)
    val script = Paths.get(sys.props("user.dir"), "scripts", "lint_oracles.py")
    assert(Files.exists(script), s"missing $script")
    val out = new StringBuilder
    val rc = Process(Seq("python3", script.toString, json.toString,
      "/root/testdata/sf0.001")).!(ProcessLogger(l => out.append(l).append('\n')))
    assert(rc == 0, s"oracle lint failed:\n$out")
  }
}
