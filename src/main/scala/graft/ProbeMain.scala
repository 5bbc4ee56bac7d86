package graft

/** Prints [[Bench.regimeProbe]] for THIS host — the floor-maintenance
  * companion: record the value as `"_probe_sec"` in a floor file
  * whenever its floors are (re)based, so later runs on a different
  * host regime gate against probe-normalized floors instead of
  * false-flagging (see regimeProbe's scaladoc). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val v = Bench.regimeProbe()
    println(f"PROBE=$v%.3f")
  }
}
