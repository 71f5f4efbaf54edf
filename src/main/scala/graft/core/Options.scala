package graft.core

/** Display-options manager (reference core/options.py:5-123): the same
  * five options with the same defaults, set/get/reset semantics
  * (unknown names are an error), and the aligned `displayOptions`
  * rendering. `consoleWidth` of None/0 means "auto" — the repr then
  * applies no total-width cap (a library string function has no
  * terminal to measure; the reference's doctest harness pins 120,
  * which [[ToStringRepr]] consumers can do via setOption).
  *
  * State is a JVM-wide atomic reference (the reference's module-level
  * `option_manager` analog); values are read at repr time. */
object Options {

  private case class Opt(value: Option[Int], desc: String)

  private def defaults: Map[String, Opt] = scala.collection.immutable.ListMap(
    "max_rows_to_show" -> Opt(Some(8),
      "the max number of rows to show in PyRanges repr"),
    "max_column_names_to_show" -> Opt(Some(3),
      "how many columns listed in PyRanges repr when not all fit the screen width"),
    "console_width" -> Opt(None,
      "console width, affecting PyRanges representation (None for auto)"),
    "html_max_cols" -> Opt(Some(20),
      "max number of columns to show as HTML (e.g. Jupyter), others are hidden"),
    "html_max_rows" -> Opt(None,
      "max n. of rows shown as HTML (e.g. Jupyter). If undefined, max_rows_to_show is used"))

  private val current =
    new java.util.concurrent.atomic.AtomicReference(defaults)

  private def require_known(name: String): Unit =
    require(defaults.contains(name), s"Option $name not recognized.")

  def setOption(name: String, value: Int): Unit = {
    require_known(name)
    current.updateAndGet(m => m.updated(name, m(name).copy(value = Some(value))))
  }

  /** Unset back to None (only meaningful for console_width /
    * html_max_rows, whose default IS None). */
  def unsetOption(name: String): Unit = {
    require_known(name)
    current.updateAndGet(m => m.updated(name, m(name).copy(value = None)))
  }

  def getOption(name: String): Option[Int] = {
    require_known(name)
    current.get()(name).value
  }

  def resetOptions(): Unit = current.set(defaults)

  /** Aligned name : value (description) block, one option per line —
    * the reference's display_options format. */
  def displayOptions: String = {
    val m = current.get()
    val maxK = m.keys.map(_.length).max
    def v(o: Opt): String = o.value.map(_.toString).getOrElse("None")
    val maxV = m.values.map(o => v(o).length).max
    m.map { case (k, o) =>
      s"${k.padTo(maxK, ' ')} : ${v(o).reverse.padTo(maxV, ' ').reverse} (${o.desc})"
    }.mkString("\n")
  }
}
