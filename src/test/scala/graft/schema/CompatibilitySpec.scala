package graft.schema

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

/** Registry-side compatibility enforcement ([[Compatibility]],
  * [[InMemorySchemaRegistry.register]]): the reference pins FULL on
  * its subject (producer.scala:60) so an incompatible producer schema
  * is rejected AT REGISTRATION — these tests pin each mode's
  * admit/reject behavior on the reference's own v1/v2 evolution plus
  * a genuinely breaking v3.
  */
class CompatibilitySpec extends AnyFunSuite {

  private def s(json: String): Schema = new Schema.Parser().parse(json)

  // v1 minus a NON-defaulted field: old readers of new data break
  // (forward-incompatible), but new readers of old data are fine
  private val dropped = s(
    s"""{"type":"record","name":"Product","namespace":"graft.product","fields":[
       |{"name":"productId","type":"string"},
       |{"name":"eventId","type":"string"},
       |{"name":"timestamp","type":"long"}]}""".stripMargin.replaceAll("\n", ""))

  test("the reference's v1 -> v2 evolution (defaulted adds) is FULL-compatible") {
    val reg = new InMemorySchemaRegistry() // default FULL
    val id1 = reg.register("product-value", ProductSchemas.v1)
    val id2 = reg.register("product-value", ProductSchemas.v2)
    assert(id1 != id2)
    // idempotent re-register of an OLD version never re-gates
    assert(reg.register("product-value", ProductSchemas.v1) == id1)
  }

  test("an incompatible type change is rejected under FULL; history unchanged") {
    val reg = new InMemorySchemaRegistry()
    reg.register("product-value", ProductSchemas.v1)
    val e = intercept[SchemaIncompatibleException](
      reg.register("product-value", ProductSchemas.v3Incompatible))
    assert(e.getMessage.contains("FULL"))
    assert(reg.versionIds("product-value").size == 1,
      "a rejected registration must not grow the subject history")
    assert(reg.testCompatibility("product-value",
      ProductSchemas.v3Incompatible).nonEmpty)
    assert(reg.testCompatibility("product-value", ProductSchemas.v2).isEmpty)
  }

  test("BACKWARD admits a field drop that FORWARD/FULL reject") {
    // dropping a non-defaulted field: new reader reads old data fine
    // (backward ok) but an old reader cannot fill the missing field
    // from new data (forward broken)
    assert(Compatibility.violations(Compatibility.Backward, dropped,
      Seq(ProductSchemas.v1)).isEmpty)
    assert(Compatibility.violations(Compatibility.Forward, dropped,
      Seq(ProductSchemas.v1)).nonEmpty)
    assert(Compatibility.violations(Compatibility.Full, dropped,
      Seq(ProductSchemas.v1)).nonEmpty)
    val reg = new InMemorySchemaRegistry(Compatibility.Backward)
    reg.register("p", ProductSchemas.v1)
    reg.register("p", dropped) // admitted under BACKWARD
    val full = new InMemorySchemaRegistry()
    full.register("p", ProductSchemas.v1)
    intercept[SchemaIncompatibleException](full.register("p", dropped))
  }

  test("NONE admits anything; per-subject override beats the registry default") {
    val reg = new InMemorySchemaRegistry() // FULL default
    reg.setCompatibility("free", Compatibility.None)
    reg.register("free", ProductSchemas.v1)
    reg.register("free", ProductSchemas.v3Incompatible) // NONE: fine
    // the sibling subject still enforces the default
    reg.register("gated", ProductSchemas.v1)
    intercept[SchemaIncompatibleException](
      reg.register("gated", ProductSchemas.v3Incompatible))
  }

  test("transitive modes gate against EVERY prior version, not just latest") {
    // numeric promotion makes a clean one-directional history
    val a = s("""{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
    val b = s("""{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}""")
    val c = s("""{"type":"record","name":"R","fields":[{"name":"x","type":"double"}]}""")
    // int -> long -> double: each step backward-ok (widening reads),
    // and double reads BOTH priors, so BACKWARD_TRANSITIVE admits c
    assert(Compatibility.violations(Compatibility.BackwardTransitive, c,
      Seq(b, a)).isEmpty)
    // but a LONG candidate after [double, long, int] priors cannot
    // read the double history — transitive catches what latest-only
    // would too here, so pin the distinguishing case: candidate long
    // after priors [long(newest), double(oldest)]: vs latest long ok,
    // vs old double broken — only the transitive mode rejects
    assert(Compatibility.violations(Compatibility.Backward, b,
      Seq(b, c)).isEmpty, "latest-only misses the old incompatibility")
    assert(Compatibility.violations(Compatibility.BackwardTransitive, b,
      Seq(b, c)).nonEmpty, "transitive must check the full history")
  }

  test("mode names round-trip through of(); unknown names fail loudly") {
    Compatibility.all.foreach(m => assert(Compatibility.of(m.name) == m))
    assert(Compatibility.of("full") == Compatibility.Full)
    intercept[IllegalArgumentException](Compatibility.of("SIDEWAYS"))
  }
}
