"""Text analysis operators (wordcount, langid, quality, tokens,
fingerprint). Placeholder."""
