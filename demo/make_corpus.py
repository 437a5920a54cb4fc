import yaml
from multi_speaker_tts_tpu.hparams import default_hparams
from multi_speaker_tts_tpu.data import generate_synthetic_dataset

def main():
    hp = default_hparams(
        Encoder={"Embedding_Size": 256, "Conv": {"Stacks": 2, "Channels": 256, "Kernel_Size": 5, "Dropout_Rate": 0.5}, "LSTM_Size": 256},
        Speaker_Embedding={"Type": "GE2E", "Embedding_Size": 64,
                           "GE2E": {"LSTM": {"Sizes": 256, "Stacks": 2}, "Window_Length": 48, "Window_Shift": 24,
                                     "Loss": {"Initial_Weight": 10.0, "Initial_Bias": -5.0}}},
        Decoder={"Prenet": {"Sizes": [128, 128], "Dropout_Rate": 0.5},
                 "Attention": {"Size": 128, "Conv": {"Channels": 32, "Kernel_Size": 31}},
                 "LSTM": {"Sizes": 512, "Stacks": 2}, "N_Frames_Per_Step": 1,
                 "Max_Step": 400, "Stop_Threshold": 0.5},
        Postnet={"Conv": {"Stacks": 3, "Channels": 256, "Kernel_Size": 5, "Dropout_Rate": 0.5}},
        Linear_Head={"Use": True, "Conv": {"Stacks": 1, "Channels": 256, "Kernel_Size": 5, "Dropout_Rate": 0.5}},
        Train={"Batch_Size": 16, "Learning_Rate": {"Initial": 1e-3, "Warmup_Step": 200},
               "Logging_Interval": 50, "Checkpoint_Save_Interval": 500,
               "Evaluation_Interval": 500, "Inference_Interval": 10**9, "Max_Step": 3000,
               "Batch_Bucketing": {"Token_Buckets": [48], "Mel_Buckets": [128]}},
    )
    yaml.safe_dump(hp.to_dict(), open("demo_hp.yaml", "w"))
    meta = generate_synthetic_dataset(hp, "corpus", n_speakers=6, n_utterances=20, num_workers=8)
    print("demo corpus:", len(meta["Files"]), "utterances")

if __name__ == "__main__":
    main()
