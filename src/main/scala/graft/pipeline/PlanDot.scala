package graft.pipeline

import org.apache.spark.sql.Dataset

/** Jet parity: `Pipeline.toDotString()` / `DAG.toDotString()` (reference:
  * hazelcast-jet-core/src/main/java/com/hazelcast/jet/pipeline/Pipeline.java,
  * core/DAG.java) render the job DAG in GraphViz DOT for inspection and docs.
  *
  * In this engine the DAG a user builds IS the Catalyst logical plan, so the
  * render walks the analyzed plan: one node per operator (nodeName, with the
  * relation/alias detail where it helps), one edge per child→parent data flow —
  * the same direction Jet draws source→sink. Purely driver-side introspection;
  * nothing executes.
  */
object PlanDot {

  def toDotString(ds: Dataset[_]): String = {
    val sb = new StringBuilder("digraph pipeline {\n  rankdir=BT;\n")
    var id = 0
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      id += 1
      val my = id
      val detail = p match {
        case r: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          s" ${r.alias}"
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          " " + r.relation.toString.take(40)
        case _ => ""
      }
      sb.append(s"""  n$my [label="${esc(p.nodeName + detail)}"];\n""")
      p.children.foreach { c =>
        val ci = walk(c)
        sb.append(s"  n$ci -> n$my;\n")
      }
      my
    }
    walk(ds.queryExecution.analyzed)
    sb.append("}\n")
    sb.toString
  }
}
