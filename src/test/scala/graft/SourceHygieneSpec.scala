package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the repository's sources against the invisible-content failure
  * mode ADVICE r9 flagged: a raw control byte (e.g. NUL) embedded in a
  * string literal makes git treat the file as binary — its contents vanish
  * from diffs and review, and editors render the byte invisibly, so the
  * displayed code misrepresents actual behavior. Control characters belong
  * in sources only as visible escapes (the six-character sequence backslash-u0000). */
class SourceHygieneSpec extends AnyFunSuite {

  private val allowed = Set('\t'.toByte, '\n'.toByte, '\r'.toByte)

  private def sourceFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".scala") || n.endsWith(".sbt") || n.endsWith(".md") ||
          n.endsWith(".py") || n.endsWith(".json")
      }
      .toSeq

  test("no raw control bytes in any source file") {
    val roots = Seq(Paths.get("src"), Paths.get("scripts"))
      .filter(Files.isDirectory(_))
    val offenders = roots.flatMap(sourceFiles).flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if b >= 0 && b < 0x20 && !allowed.contains(b) => (b, i)
      }
      bad.headOption.map { case (b, i) =>
        f"$p: byte 0x$b%02x at offset $i"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
