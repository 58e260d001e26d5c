package graft

import org.scalatest.funsuite.AnyFunSuite

/** Raw control bytes in a source file make it opaque to grep/git
  * textual diff (binary detection) — the defect recurred twice
  * (Bpe.scala round 13, Workflow.scala round 14), so pin it: every
  * Scala source must be plain text. Tab/newline/CR are the only
  * permitted bytes below 0x20; char-literal sentinels must use
  * escapes ('\\u0000'), never the raw byte. */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources: Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get("src")
    val walk = java.nio.file.Files.walk(root)
    try {
      val it = walk.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".scala")) buf += p
      }
      buf.toSeq
    } finally walk.close()
  }

  test("no Scala source contains raw control bytes") {
    val allowed = Set[Byte]('\t'.toByte, '\n'.toByte, '\r'.toByte)
    val offenders = scalaSources.flatMap { p =>
      val bytes = java.nio.file.Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collectFirst {
        case (b, i) if (b >= 0 && b < 0x20 && !allowed(b)) || b == 0x7f =>
          (b, i)
      }
      bad.map { case (b, i) => s"$p: byte 0x${"%02x".format(b)} at offset $i" }
    }
    assert(offenders.isEmpty,
      s"raw control bytes in sources:\n${offenders.mkString("\n")}")
  }

  test("the sweep saw the full tree") {
    // a silently-empty walk (cwd not the repo root) must fail loudly,
    // not pass vacuously
    assert(scalaSources.size > 100, s"only ${scalaSources.size} sources seen")
  }
}
