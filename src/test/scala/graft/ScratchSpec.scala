package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared-base discipline ([[Scratch.sharedBase]]): one build
  * per key per JVM, clones are independent copies (mutating a clone
  * never reaches the base), and copyDir reproduces the tree.
  */
class ScratchSpec extends AnyFunSuite {

  private def write(path: String, s: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, s.getBytes("UTF-8"))
  }
  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  test("sharedBase builds exactly once per key; distinct keys distinct") {
    var builds = 0
    def get(k: String) = Scratch.sharedBase(k) { d =>
      builds += 1
      write(s"$d/sub/a.txt", s"built:$k")
    }
    val key = s"spec:${System.nanoTime()}"
    val d1 = get(key)
    val d2 = get(key)
    assert(d1 === d2)
    assert(builds === 1)
    assert(read(s"$d1/sub/a.txt") === s"built:$key")
    val other = get(key + ":pos=true")
    assert(other !== d1)
    assert(builds === 2)
  }

  test("cloneBase is an independent deep copy: mutating the clone " +
      "leaves the base untouched; re-clone restores a clean copy") {
    val key = s"spec-clone:${System.nanoTime()}"
    val base = Scratch.sharedBase(key)(d => write(s"$d/x/f.txt", "base"))
    val c1 = Scratch.cloneBase(base, "scratchspec_c")
    assert(read(s"$c1/x/f.txt") === "base")
    write(s"$c1/x/f.txt", "mutated")
    write(s"$c1/x/extra.txt", "new")
    assert(read(s"$base/x/f.txt") === "base")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/x/extra.txt")))
    // a later gate run re-clones under the same name and starts clean
    val c2 = Scratch.cloneBase(base, "scratchspec_c")
    assert(read(s"$c2/x/f.txt") === "base")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$c2/x/extra.txt")))
  }
}
