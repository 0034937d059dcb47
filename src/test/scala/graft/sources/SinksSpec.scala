package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** pythonRepr must be byte-identical to Python's json.dumps float
  * rendering (cases verified against CPython 3.11). */
class SinksSpec extends AnyFunSuite {
  private val cases: Seq[(Double, String)] = Seq(
    0.0                    -> "0.0",
    1.0                    -> "1.0",
    -2.5                   -> "-2.5",
    123.456                -> "123.456",
    1e7                    -> "10000000.0",
    1.25e7                 -> "12500000.0",
    1.2136869306000003e8   -> "121368693.06000003",
    17453393724.0          -> "17453393724.0",
    1e15                   -> "1000000000000000.0",
    1e16                   -> "1e+16",
    1.670908358807286e22   -> "1.670908358807286e+22",
    8.415536369994047e25   -> "8.415536369994047e+25",
    0.0001                 -> "0.0001",
    1.5e-4                 -> "0.00015",
    1e-5                   -> "1e-05",
    -4.32e-7               -> "-4.32e-07",
    0.05                   -> "0.05")

  cases.foreach { case (d, expected) =>
    test(s"pythonRepr($d) == $expected") {
      assert(Sinks.pythonRepr(d) === expected)
    }
  }
}
