package graft.tools

/** Minimal JSON string escaper shared by the runnable tools' stage
  * emitters ([[AnnLifecycle.Stage.json]], [[CuratePipeline.Stage.json]],
  * [[TrainShards]]): stage notes interpolate user-supplied paths, and a
  * path containing `"` or `\` (or a control char) would otherwise emit
  * an invalid JSON line (r11 ADVICE). Scope is deliberately this —
  * string escaping only; the tools' records are flat hand-built lines,
  * not a JSON library use case.
  */
private[tools] object Json {
  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.result()
  }
}
