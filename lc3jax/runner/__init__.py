"""Runner layer: WAV I/O, stream batching, and the file-to-file CLI
(the reference's examples/ layer, SURVEY.md section 1 layer 5)."""
