"""Durable lake state: manifests (exactly-once commits), checkpoints
(per-partition high-watermarks), lineage records. All state lives on the
filesystem, never in actor memory across epochs — any worker or driver
death resumes from the manifests (SURVEY §3.4)."""
