# WaveGlow-style flow vocoder (mel -> waveform); see waveglow.py (added in
# a later milestone). load_waveglow / waveglow_infer are re-exported here
# once available.
