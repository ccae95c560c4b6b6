package graft

/** Fixed per-name scratch directories for gate queries that materialize
  * on-disk layouts (q96/q97/q99/q104/q105/q107/q111):
  * `createTempDirectory` per run
  * leaks a full corpus copy per execution (Bench alone runs each query
  * 4+ times a round), while a FIXED path reused across runs is
  * self-cleaning because every writer uses overwrite semantics — disk
  * residue is bounded at one copy per query name, total, forever.
  * Single-process use only (the gate, Bench, and the test suite each
  * run queries sequentially); two JVMs racing the same name would fail
  * noisily on the overwrite, never silently corrupt.
  */
object Scratch {
  def dir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_scratch_$name")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** [[dir]] wiped clean first — for queries whose on-disk state is
    * STATEFUL across a run (q96's append-only snapshot versions, q97's
    * watermark store): reuse without the wipe would leak last run's
    * state into this run's answers, not just its disk.
    */
  def fresh(name: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    val p = Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_scratch_$name")
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(q => Files.deleteIfExists(q))
      finally stream.close()
    }
    Files.createDirectories(p)
    p.toString
  }
}
