package graft.pipeline

/** Shared `${var}` interpolation + `???` required-override check for
  * both YAML dialects (ConfigPipeline's stage/workflow forms and
  * AudioConfigPipeline's Hydra processors form). Dotted references
  * (`${a.b}`) are matched too so they fail LOUDLY as unresolved
  * instead of passing through as literal text.
  */
private[pipeline] object YamlVars {

  private val Ref = "\\$\\{([\\w.]+)\\}".r

  def interpolate(raw: String, vars: Map[String, String]): String =
    Ref.replaceAllIn(raw, m =>
      java.util.regex.Matcher.quoteReplacement(vars.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unresolved config var $${${m.group(1)}}"))))

  /** Interpolate and reject `???` anywhere in the result (containment,
    * not equality: a marker arriving THROUGH interpolation must fail
    * just as loudly as a bare one).
    */
  def resolve(raw: String, vars: Map[String, String]): String = {
    val r = interpolate(raw, vars)
    require(!r.contains("???"),
      s"config value '$raw' resolves to '$r' — an unresolved required " +
        "override (???); pass it in `overrides`")
    r
  }

  /** Fixpoint-resolve the var table itself (values may reference other
    * vars, e.g. `output_dir: ${raw_data_dir}/result`); bounded so a
    * circular reference raises instead of spinning.
    */
  def fixpoint(vars0: Map[String, String]): Map[String, String] = {
    var vars = vars0
    var rounds = 0
    var changed = true
    while (changed) {
      require(rounds < 20,
        s"circular $${var} interpolation in config vars: ${vars0.keys.mkString(", ")}")
      changed = false
      vars = vars.map { case (k, v) =>
        val r = Ref.replaceAllIn(v, m =>
          java.util.regex.Matcher.quoteReplacement(vars.getOrElse(m.group(1), m.matched)))
        if (r != v) changed = true
        k -> r
      }
      rounds += 1
    }
    vars
  }
}
