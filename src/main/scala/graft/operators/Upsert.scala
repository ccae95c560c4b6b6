package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Delta-style MERGE upsert rewritten for plain Spark (SURVEY.md §2a S7, §2c J5).
  *
  * Reference: `MERGE INTO silver USING updates ON t.event_id = s.event_id
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  * (`04_silver_transformation.py:196-202`). With no Delta log available, the
  * same semantics are an anti-join + union: rows of the target whose key does
  * not appear in the updates, plus all update rows.
  *
  * Scale: the anti-join shuffles on the key unless the updates side is small
  * enough to broadcast — which is the common CDC case (daily increment ≪
  * accumulated table), and AQE converts to broadcast automatically at
  * runtime. Updates must be unique per key (dedup upstream) or the "UPDATE
  * SET *" would be ambiguous — same constraint Delta MERGE enforces.
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)
}
