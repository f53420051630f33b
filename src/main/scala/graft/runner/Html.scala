package graft.runner

/** Shared plumbing for the self-contained HTML report sinks (validation
  * report + experiment report) — one escaping rule, one status palette,
  * one page scaffold, so the two artifacts cannot drift apart.
  */
object Html {

  def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def statusColor(status: String): String = status match {
    case "PASS" | "SUCCESS" => "#2e7d32"
    case "WARN"             => "#f9a825"
    case _                  => "#c62828"
  }

  def badge(status: String): String =
    s"""<span style="color:${statusColor(status)};font-weight:bold">${esc(status)}</span>"""

  /** Colored label whose palette is driven by a boolean verdict. */
  def verdictBadge(ok: Boolean, label: String): String =
    s"""<span style="color:${if (ok) "#2e7d32" else "#c62828"};font-weight:bold">${esc(label)}</span>"""

  def page(title: String, body: String): String =
    s"""<!doctype html><html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse;margin:1em 0}
       |td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}th{background:#eee}</style>
       |</head><body>
       |$body
       |</body></html>""".stripMargin

  def write(path: String, title: String, body: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), page(title, body))
    ()
  }
}
