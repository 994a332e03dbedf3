from audio_rag_tpu.api.app import main

main()
