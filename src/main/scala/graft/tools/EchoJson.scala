package graft.tools

/** Framing probe for the driver's bench-tail parser: prints one JSON line
  * and exits. `sbt -batch "runMain graft.tools.EchoJson"` must end with
  * that line BARE on stdout — no "[info] " prefix (outputStrategy =
  * StdoutOutput in build.sbt) and no trailing "[success]" banner
  * (showSuccess := false). Exists so the framing contract is testable in
  * seconds instead of a 50-minute bench run. */
object EchoJson {
  def main(args: Array[String]): Unit = {
    println("""{"metric":"echo","value":1.0,"unit":"sec"}""")
    sys.exit(0)
  }
}
