from crane_tpu.serve.api import main

main()
