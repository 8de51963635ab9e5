package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Registry-side schema-evolution gating — the behavior the reference
  * PINS on its subject (`Compatibility.FULL` at
  * /root/reference/notebooks/msk/producer.scala:60, prose in the
  * README's registry setup): an incompatible evolution is REJECTED at
  * registration time, so a producer bug that would break deployed
  * readers surfaces as one loud 409 at the producer, not as decode
  * failures scattered across every downstream consumer.
  *
  * Modes mirror the public Confluent registry config surface
  * (NONE / BACKWARD / FORWARD / FULL, each with a _TRANSITIVE
  * variant). Checks run on Avro's own published resolution rules
  * ([[org.apache.avro.SchemaCompatibility]]), which is exactly what
  * the decode path ([[graft.functions.AvroDecode]] writer→reader
  * resolution) executes — so "the registry admitted it" and "readers
  * can resolve it" are the same predicate by construction:
  *
  *  - BACKWARD: the NEW schema, used as a READER, can decode data
  *    written with the latest prior version (consumers upgrade first).
  *  - FORWARD: the latest prior version, used as a READER, can decode
  *    data written with the NEW schema (producers upgrade first).
  *  - FULL: both — either side may upgrade in any order.
  *  - *_TRANSITIVE: the same predicate against EVERY prior version,
  *    not just the latest (data on disk is routinely several
  *    evolutions old).
  */
sealed abstract class Compatibility(val name: String,
    val backward: Boolean, val forward: Boolean, val transitive: Boolean) {
  override def toString: String = name
}

object Compatibility {
  case object None extends Compatibility("NONE", false, false, false)
  case object Backward extends Compatibility("BACKWARD", true, false, false)
  case object Forward extends Compatibility("FORWARD", false, true, false)
  case object Full extends Compatibility("FULL", true, true, false)
  case object BackwardTransitive
    extends Compatibility("BACKWARD_TRANSITIVE", true, false, true)
  case object ForwardTransitive
    extends Compatibility("FORWARD_TRANSITIVE", false, true, true)
  case object FullTransitive
    extends Compatibility("FULL_TRANSITIVE", true, true, true)

  val all: Seq[Compatibility] = Seq(None, Backward, Forward, Full,
    BackwardTransitive, ForwardTransitive, FullTransitive)

  def of(name: String): Compatibility =
    all.find(_.name == name.toUpperCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown compatibility mode '$name' " +
          s"(expected one of ${all.map(_.name).mkString(", ")})"))

  private def incompat(reader: Schema, writer: Schema,
      direction: String): Seq[String] = {
    val res = SchemaCompatibility
      .checkReaderWriterCompatibility(reader, writer).getResult
    if (res.getCompatibility == SchemaCompatibilityType.COMPATIBLE) Nil
    else res.getIncompatibilities.asScala.toSeq.map(i =>
      s"$direction at ${i.getLocation}: ${i.getType} — ${i.getMessage}")
  }

  /** Why `candidate` may NOT be registered after `priors` (newest
    * first) under `mode` — empty means admissible. Non-transitive
    * modes check only the newest prior.
    */
  def violations(mode: Compatibility, candidate: Schema,
      priors: Seq[Schema]): Seq[String] = {
    val against = if (mode.transitive) priors else priors.take(1)
    against.flatMap { prior =>
      (if (mode.backward)
        incompat(candidate, prior, "backward (new reader, old data)")
      else Nil) ++
        (if (mode.forward)
          incompat(prior, candidate, "forward (old reader, new data)")
        else Nil)
    }
  }
}

/** Thrown (and mapped to HTTP 409 on the wire) when a registration
  * violates the subject's compatibility mode. `modeName` is the
  * enforcing mode's name where known locally, or `"registry"` when a
  * remote server rejected and only its 409 body is available.
  */
class SchemaIncompatibleException(val subject: String,
    val modeName: String, val problems: Seq[String])
  extends IllegalArgumentException(
    s"schema for subject '$subject' violates $modeName compatibility:\n  " +
      problems.mkString("\n  "))
