package graft.gen

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.ProductSchemas

class EventGeneratorSpec extends AnyFunSuite {

  test("deterministic for a fixed seed") {
    val a = new EventGenerator(seed = 42).events(50)
    val b = new EventGenerator(seed = 42).events(50)
    assert(a == b)
  }

  test("v1:v2 mix is 1:2 and domains match the reference") {
    val es = new EventGenerator(seed = 7).events(300)
    assert(es.count(!_.isV2) == 100)
    assert(es.forall(e => ProductSchemas.types.contains(e.productType)))
    assert(es.flatMap(_.size).forall(ProductSchemas.sizes.contains))
    assert(es.flatMap(_.color).forall(ProductSchemas.colors.contains))
    assert(es.forall(e => ProductSchemas.productIds.contains(e.productId)))
  }

  test("duplicateEvery injects repeated eventIds") {
    val es = new EventGenerator(seed = 7).events(20, duplicateEvery = 5)
    assert(es.map(_.eventId).distinct.size < 20)
  }
}
