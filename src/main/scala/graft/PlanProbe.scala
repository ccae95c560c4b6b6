package graft

/** Dev scratch: dump the analyzed/optimized condition tree of a range
  * θ-join so the interval-join rewrite rule can match the real node
  * shapes (not guessed ones). Not part of the shipped surface.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plan-probe")
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.registerAll(spark, dir)
    val df = spark.sql(
      """SELECT p.event_id, c.ts AS c_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTES
        | AND c.ts < p.ts""".stripMargin)
    val join = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    println("=== join condition tree ===")
    join.condition.foreach { c =>
      println(c.treeString)
      c.foreach(e => println(s"node: ${e.getClass.getName} :: $e :: ${e.dataType}"))
    }
    println("=== physical ===")
    df.explain("formatted")
    spark.stop()
  }
}
