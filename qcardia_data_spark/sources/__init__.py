"""Sources & sinks (SURVEY §2.1) and the multimodal-column pattern
(binary payloads + typed metadata + lazy decode UDFs)."""
