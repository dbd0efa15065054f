package graft.embed

/** Offline model-hub operations (C7). The reference's `list_models`
  * (src/hf_ops.rs:257-289) queries the HF hub for repos tagged
  * "letsearch" and prints `hf://{modelId}` sorted by download count; the
  * zero-egress analog scans the local mirror root (`GRAFT_HF_MIRROR` —
  * the same root `hf://` data paths resolve against, sources/Ingest
  * .scala) for `<user>/<repo>/config.json` files carrying the
  * letsearch marker, and reads each repo's declared variants the way the
  * downloader does (hf_ops.rs:197-224). No download ordering exists
  * offline, so results sort by model id.
  */
object ModelHub {

  final case class HubModel(modelId: String, variants: Seq[String])

  def listModels(mirrorRoot: Option[String] = sys.env.get("GRAFT_HF_MIRROR")): Seq[HubModel] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = mirrorRoot.map(new java.io.File(_)).filter(_.isDirectory) match {
      case Some(r) => r
      case None => return Seq.empty
    }
    val repos = for {
      user <- Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.sortBy(_.getName)
      if user.isDirectory
      repo <- Option(user.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.sortBy(_.getName)
      if repo.isDirectory
      cfg = new java.io.File(repo, "config.json")
      if cfg.isFile
    } yield (s"${user.getName}/${repo.getName}", cfg)
    repos.flatMap { case (id, cfg) =>
      try {
        val json = JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(cfg.toPath), "UTF-8"))
        // the compatibility marker the reference checks before download
        // (hf_ops.rs:197-203): a letsearch_version plus a variants list
        json \ "letsearch_version" match {
          case JNothing => None
          case _ =>
            val variants = (json \ "variants") match {
              case JArray(vs) => vs.flatMap(v => (v \ "variant") match {
                case JString(s) => Some(s)
                case _ => None
              })
              case _ => Nil
            }
            Some(HubModel(s"hf://$id", variants))
        }
      } catch { case _: Exception => None }
    }
  }
}
