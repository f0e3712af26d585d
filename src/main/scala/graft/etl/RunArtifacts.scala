package graft.etl

import java.nio.file.{Files, Paths}

/** Driver-side run-summary JSON artifacts (ref: per-run summary writers,
  * src/mf_etl/bronze/pipeline.py:70-81,366-426 and ~20 clones). Plain JVM
  * file IO — these are tiny sidecars, not Dataset ops. */
object RunArtifacts {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + esc(s) + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" else d.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + esc(k.toString) + "\": " + render(x) }
        .mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(render).mkString("[", ", ", "]")
    case other => "\"" + esc(other.toString) + "\""
  }

  /** Atomic JSON write: tmp file + move (ref: tmp + os.replace atomic
    * visibility, src/mf_etl/bronze/writer.py:60-83). */
  def writeJson(path: String, payload: Map[String, Any]): Unit = {
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, render(payload))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
