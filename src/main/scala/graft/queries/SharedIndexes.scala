package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.Tables

/** Immutable base index layouts shared across gate queries (round-11
  * verdict item: q160–q164/q182–q184/q188 rebuilt identical base
  * indexes from the identical corpus several times per sweep). Each
  * entry is built ONCE per (build-inputs) key per JVM by
  * [[graft.Scratch.sharedBase]] and never mutated: read-only gates
  * probe it in place, lifecycle gates that append/grow/delete/version
  * start from a [[graft.Scratch.cloneBase]] copy — copy-on-write over
  * an immutable published generation, which is exactly the production
  * shape (one build, many consumers). Gates whose base corpus is a
  * query-specific SLICE (q160's %7 split, q162's %3 split, q164's v0)
  * keep building their own: the build IS part of those gates'
  * semantics.
  */
object SharedIndexes {

  /** Full-corpus BM25 text index per (sf dir, positional flag). */
  def textFull(spark: SparkSession, dir: String,
      withPositions: Boolean = false): String =
    graft.Scratch.sharedBase(s"textfull:$dir:pos=$withPositions") { d =>
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      graft.operators.TextIndex.write(docs, "doc_id", "text", s"$d/idx",
        withPositions = withPositions)
    } + "/idx"
}
