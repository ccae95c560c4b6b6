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

  /** Process-lifetime memoized IMMUTABLE base layouts shared across
    * gate queries (round-11 verdict: the text/binary lifecycle gates
    * rebuilt the SAME base index from the SAME corpus eight times per
    * sweep — ~55 s of pure duplicate build). The first caller per key
    * builds at a canonical path; later callers (and later Bench runs of
    * the same query) reuse it. CONTRACT: the key must encode every
    * build input (sf dir, corpus slice, family params), and a gate that
    * MUTATES its index must clone first ([[cloneBase]]) — the base
    * itself is append-never, rewrite-never. Production analogy: immutable
    * published index generations consumed by many jobs, each derivation
    * copy-on-write.
    */
  private val bases =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def sharedBase(key: String)(build: String => Unit): String =
    bases.computeIfAbsent(key, _ => {
      val d = fresh("base_" +
        key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80) +
        "_" + Integer.toHexString(key.hashCode))
      build(d)
      d
    })

  /** Recursive directory copy (contents of `src` into existing `dst`). */
  def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.createDirectories(d)
    val stream = Files.walk(s)
    try stream.forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally stream.close()
  }

  /** A fresh mutable copy of a shared base for a gate that mutates. */
  def cloneBase(src: String, name: String): String = {
    val dst = fresh(name)
    copyDir(src, dst)
    dst
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
